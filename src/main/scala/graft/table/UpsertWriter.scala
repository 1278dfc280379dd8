package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-equivalent upsert semantics without Iceberg (SURVEY.md S7.4).
  *
  * The reference's two MERGE flavors:
  *  - [[upsertAll]]: `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
  *    THEN INSERT *` on a natural key (build_stock_fact_table.py:
  *    104-111, build_stock_aggregations.py:123-130,187-194,243-250).
  *  - [[upsertSelective]]: updates mutable columns but preserves
  *    chosen target columns (`first_seen_date`, `stock_key`) on match
  *    (build_stock_dimensions.py:88-102).
  *
  * Both are join-based plans exactly like Iceberg's
  * RewriteMergeIntoTable produces, committed through whichever
  * [[WarehouseWrites]] store is passed: [[TableStore]]'s staged swap
  * (destructive, single-writer) or [[VersionedTableStore]]'s snapshot
  * commit (time travel + rollback + optimistic concurrency).
  * Requirements: `source` is key-unique (guaranteed upstream by
  * the W1 dedup / rollup groupings); both sides share the key schema.
  *
  * Scale: the anti-join and full-outer join shuffle hash-partition on
  * the natural key -- the same key the tables are queried by -- and
  * AQE picks broadcast when the daily source is small relative to the
  * target, which is the reference's exact shape (5-row source vs
  * growing fact).
  */
object UpsertWriter {

  /** S7 update-all MERGE: matched target rows are replaced wholesale,
    * unmatched kept, new source rows inserted. Idempotent: re-merging
    * the same source is a no-op.
    *
    * For partitioned tables the merge only touches partitions the
    * source lands in: the anti-join is restricted to those partitions
    * (semi-join pre-filter = partition pruning on the target scan)
    * and the write uses dynamic partition overwrite, so a daily merge
    * into a years-deep table rewrites one day, not the table. This is
    * the scan/commit shape Iceberg's merge gives the reference. */
  def upsertAll(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], partitionBy: Seq[String] = Nil,
      allowSchemaEvolution: Boolean = false): Unit = {
    if (!store.exists(table)) {
      store.createOrReplace(source, table, partitionBy)
      return
    }
    val target = store.read(table)
    if (!allowSchemaEvolution)
      require(source.columns.toSeq.sorted == target.columns.toSeq.sorted,
        s"schema mismatch: target=${target.columns.toSeq} source=${source.columns.toSeq}" +
          " (pass allowSchemaEvolution=true to add new columns)")
    // schema evolution (Iceberg mergeSchema parity): source-only
    // columns are added to the table (null for untouched rows),
    // target-only columns survive (null for inserted rows) -- both
    // directions via allowMissingColumns
    def union(kept: DataFrame): DataFrame =
      kept.unionByName(source, allowMissingColumns = allowSchemaEvolution)
    // adding a column to a partitioned table forces a FULL staged
    // rewrite: dynamic partition overwrite would leave untouched
    // partitions' files on the old schema, and a plain parquet read
    // takes its schema from one file -- the new column would silently
    // vanish. (A metadata catalog like Iceberg avoids this rewrite;
    // a path-addressed store cannot.)
    val widens = allowSchemaEvolution &&
      source.columns.exists(c => !target.columns.contains(c))
    if (partitionBy.isEmpty || widens) {
      // using-columns joins move the keys to the front of the output;
      // re-select to keep the table's declared column order stable
      val kept = target.join(source.select(keys.map(col): _*), keys, "left_anti")
        .select(target.columns.map(col).toSeq: _*)
      store.swapIn(union(kept), table, partitionBy)
    } else {
      val touched = target
        .join(source.select(partitionBy.map(col): _*).distinct(), partitionBy, "left_semi")
      val kept = touched.join(source.select(keys.map(col): _*), keys, "left_anti")
        .select(target.columns.map(col).toSeq: _*)
      // materialize the (partition-local) merge result before writing:
      // Spark refuses to overwrite a path that is also an input, and
      // the touched subset is small by construction (the day's
      // partitions, not the table)
      val merged = union(kept).localCheckpoint(true)
      store.overwritePartitions(merged, table, partitionBy)
      merged.unpersist()
    }
  }

  /** S8 selective-update MERGE: matched rows take source values except
    * `preserve` columns (kept from target); unmatched target rows kept
    * as-is; unmatched source rows inserted (their own `preserve`
    * values). Null-correct via match markers, not coalesce -- a
    * legitimate NULL in the source must overwrite on match. */
  def upsertSelective(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], preserve: Seq[String],
      partitionBy: Seq[String] = Nil): Unit = {
    if (!store.exists(table)) {
      store.createOrReplace(source, table, partitionBy)
      return
    }
    val target = store.read(table)
    val cols = target.columns.toSeq
    require(source.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: target=$cols source=${source.columns.toSeq}")
    val t = target.withColumn("__t", lit(true)).as("t")
    val s = source.withColumn("__s", lit(true)).as("s")
    val joined = t.join(s, keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")
    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val fromS = col("s.__s").isNotNull
    val merged = joined.select(cols.map { c =>
      val pick =
        if (keys.contains(c)) when(fromS, col(s"s.$c")).otherwise(col(s"t.$c"))
        else if (preserve.contains(c)) when(matched, col(s"t.$c"))
          .otherwise(when(fromS, col(s"s.$c")).otherwise(col(s"t.$c")))
        else when(fromS, col(s"s.$c")).otherwise(col(s"t.$c"))
      pick.as(c)
    }: _*)
    store.swapIn(merged, table, partitionBy)
  }
}
