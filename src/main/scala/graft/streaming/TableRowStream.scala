package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Row-shaped streaming read of a versioned-store table —
  * `spark.readStream.table("graft.default.docs")` — built on the same
  * commit-version offsets, idempotent staging, and retention contract
  * as [[ChangeFeedSource]] (it IS a ChangeFeedStream; only the
  * per-batch projection differs). Where the change feed emits a
  * CHANGELOG (keys, change_type, post/pre images), this emits the
  * table's OWN schema: the first batch is the subscribed snapshot as
  * rows, every later batch the rows newly inserted — Delta's
  * `readStream.table` semantics, including its honesty rule:
  *
  *  - an `update` or `delete` commit FAILS the stream loudly (a
  *    row-shaped stream cannot retract),
  *  - `.option("ignoreDeletes", true)` skips delete rows, still
  *    failing on updates,
  *  - `.option("ignoreChanges", true)` re-emits update post-images
  *    and skips deletes (downstream must dedup on the key).
  *
  * The guard is evaluated INSIDE the one staging filter (a
  * `raise_error` branch of the keep-predicate), so no second pass
  * over the diff and no filter/projection reorder can skip it.
  *
  * Options (all via `readStream.option(...)`): `keys` (required —
  * the primary key `snapshotDiff` diffs on), `startingVersion`
  * (`earliest` default / `latest` / version number),
  * `maxVersionsPerTrigger`, `ignoreDeletes`, `ignoreChanges`, and
  * `branch` (follow a named branch's lineage instead of main — the
  * same contract as the graft-changes feed's branch option; branch
  * manifests are retention-pinned until dropBranch).
  */
object TableRowStream {
  def apply(spark: SparkSession, root: String, table: String,
      rowSchema: StructType, checkpointLocation: String,
      options: CaseInsensitiveStringMap): MicroBatchStream = {
    val keys = Option(options.get("keys")).getOrElse(
      throw new IllegalArgumentException(
        s"streaming read of graft table `$table` needs .option(\"keys\", " +
          "\"<pk,cols>\") — the key snapshotDiff identifies rows by"))
    // validate keys against the schema the stream will actually read:
    // the BRANCH head when the branch option is set (a key column
    // added by branch-side evolveSchema exists only there), main
    // otherwise — mirroring ChangeFeedProvider.feedSchema
    val vs = new graft.table.VersionedTableStore(spark, root)
    val base = Option(options.get("branch")) match {
      case Some(b) => vs.readBranch(table, b).schema.fieldNames.toSet
      case None => vs.read(table).schema.fieldNames.toSet
    }
    keys.split(",").map(_.trim).filter(_.nonEmpty).foreach(k =>
      require(base(k), s"stream key `$k` is not a column of $table"))
    val passthrough = Seq("startingVersion", "maxVersionsPerTrigger",
      "branch")
      .flatMap(k => Option(options.get(k)).map(k -> _))
    val cfg = ChangeFeedConfig(
      Map("root" -> root, "table" -> table, "keys" -> keys) ++ passthrough)
    new TableRowStream(spark, cfg, rowSchema, checkpointLocation,
      ignoreDeletes = Option(options.get("ignoreDeletes")).exists(_.toBoolean),
      ignoreChanges = Option(options.get("ignoreChanges")).exists(_.toBoolean))
  }
}

private[graft] class TableRowStream(spark: SparkSession,
    cfg: ChangeFeedConfig, rowSchema: StructType, checkpointLocation: String,
    ignoreDeletes: Boolean, ignoreChanges: Boolean)
    extends ChangeFeedStream(spark, cfg, rowSchema, checkpointLocation) {

  private val vs2 = cfg.store(spark)

  override private[streaming] def changelog(from: Long, to: Long): DataFrame = {
    val outCols = rowSchema.fieldNames.toIndexedSeq.map(col)
    if (from == 0L) return vs2.readVersion(cfg.table, to).select(outCols: _*)
    val d = vs2.snapshotDiff(cfg.table, from, to, cfg.keys,
      includePre = false)
    val ct = col("change_type")
    val keep = ct === "insert" || (lit(ignoreChanges) && ct === "update")
    val bad =
      if (ignoreChanges) lit(false)
      else if (ignoreDeletes) ct === "update"
      else ct === "update" || ct === "delete"
    // raise_error lives INSIDE the keep-predicate: a bad row fails the
    // staging job itself, and no pushdown can evaluate "keep" without
    // also evaluating the guard
    d.filter(when(bad, raise_error(concat(
        lit(s"graft table stream over `${cfg.table}`: commit range " +
          s"($from,$to] contains a '"), ct,
        lit("' change; a row-shaped stream cannot retract. Use the " +
          "graft-changes changelog feed, or opt out with " +
          "ignoreDeletes/ignoreChanges."))).cast("boolean"))
      .otherwise(keep))
      .select(outCols: _*)
  }
}
