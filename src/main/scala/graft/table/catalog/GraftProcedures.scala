package graft.table.catalog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.table.VersionedTableStore

/** Maintenance operations as SQL stored procedures, Iceberg-style:
  *
  * {{{
  * CALL graft.system.rollback('t', 2)           -- head := snapshot 2's state
  * CALL graft.system.compact('t')               -- collapse the delta chain
  * CALL graft.system.optimize('t', 128)         -- pack small-file partitions
  * CALL graft.system.cluster_by('t', 'v', 16)   -- range-bucket layout rewrite
  * CALL graft.system.cluster_by_z('t', 'a,b', 16) -- Z-order layout rewrite
  * CALL graft.system.tag('t', 'golden', 3)      -- pin a snapshot against expiry
  * CALL graft.system.expire_snapshots('t')      -- apply the retention policy
  * }}}
  *
  * Every procedure returns a one-row `(version BIGINT)` result (the
  * committed version, or the live-version count for expiry) as a
  * driver-side [[LocalScan]]. The store calls they wrap are
  * distributed where it matters — optimize / cluster rewrites run as
  * Spark jobs; rollback, tag, expire are manifest-only.
  * `isDeterministic = false` on all of them: each CALL mutates table
  * state. The store binds lazily at CALL time (`storeF`), same
  * active-session discipline as the catalog's table operations. */
private[catalog] object GraftProcedures {

  val namespace: Array[String] = Array("system")

  val names: Seq[String] = Seq("rollback", "compact", "optimize",
    "cluster_by", "cluster_by_z", "tag", "expire_snapshots",
    "publish_staged", "drop_staged", "delete_keys", "vacuum", "audit",
    "create_branch", "drop_branch", "fast_forward", "merge_branch",
    "cherry_pick", "expire_branch", "build_bloom_index")

  def load(storeF: () => VersionedTableStore,
      name: String): UnboundProcedure = name match {
    case "rollback" => proc(storeF, name,
      "restore the table to a live snapshot's state (as a NEW commit)",
      Seq("table" -> StringType, "version" -> LongType)) { (st, r) =>
      st.rollbackTo(str(r, 0), r.getLong(1))
    }
    case "compact" => proc(storeF, name,
      "collapse the delta chain into one data dir",
      Seq("table" -> StringType)) { (st, r) =>
      st.compact(str(r, 0))
    }
    case "optimize" => proc(storeF, name,
      "rewrite partitions holding many small files into packed files",
      Seq("table" -> StringType, "target_file_mb" -> IntegerType)) {
      (st, r) =>
        st.optimizeSmallFiles(str(r, 0),
          targetBytes = r.getInt(1).toLong * 1024 * 1024)
    }
    case "cluster_by" => proc(storeF, name,
      "range-bucket layout rewrite for tight stats skipping",
      Seq("table" -> StringType, "column" -> StringType,
        "buckets" -> IntegerType)) { (st, r) =>
      st.clusterBy(str(r, 0), str(r, 1), r.getInt(2))
    }
    case "cluster_by_z" => proc(storeF, name,
      "Z-order layout rewrite over comma-separated columns",
      Seq("table" -> StringType, "columns" -> StringType,
        "buckets" -> IntegerType)) { (st, r) =>
      st.clusterByZ(str(r, 0),
        str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        r.getInt(2))
    }
    case "tag" => proc(storeF, name,
      "pin a snapshot against retention expiry under a name",
      Seq("table" -> StringType, "tag" -> StringType,
        "version" -> LongType)) { (st, r) =>
      st.tagSnapshot(str(r, 0), str(r, 1), r.getLong(2))
    }
    case "delete_keys" => proc(storeF, name,
      "merge-on-read takedown: delete rows whose keys a query yields",
      Seq("table" -> StringType, "key_columns" -> StringType,
        "keys_query" -> StringType)) { (st, r) =>
      st.deleteKeys(str(r, 0), st.spark.sql(str(r, 2)),
        str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    }
    case "publish_staged" => proc(storeF, name,
      "fast-forward the head to an audited staged (WAP) snapshot",
      Seq("table" -> StringType, "wap_id" -> StringType)) { (st, r) =>
      st.publishStaged(str(r, 0), str(r, 1))
    }
    case "drop_staged" => proc(storeF, name,
      "abandon a staged (WAP) snapshot and reclaim its data",
      Seq("table" -> StringType, "wap_id" -> StringType)) { (st, r) =>
      st.dropStaged(str(r, 0), str(r, 1))
      st.currentVersion(str(r, 0))
    }
    case "vacuum" => proc(storeF, name,
      "reclaim orphaned staging/delete dirs older than min_age_ms",
      Seq("table" -> StringType, "min_age_ms" -> LongType)) { (st, r) =>
      st.vacuum(str(r, 0), r.getLong(1))
    }
    case "build_bloom_index" => proc(storeF, name,
      "partition bloom sidecars for point lookups on a non-partition key",
      Seq("table" -> StringType, "column" -> StringType,
        "expected_per_rel" -> LongType)) { (st, r) =>
      st.buildBloomIndex(str(r, 0), str(r, 1),
        expectedPerRel = r.getLong(2)).toLong
    }
    case "audit" => new UnboundProcedure {
      override def name(): String = "audit"
      override def description(): String =
        "consistency audit: lineage, dangling dirs, orphans"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "audit"
          override def description(): String =
            "consistency audit: lineage, dangling dirs, orphans"
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            Array(ProcedureParameter.in("table", StringType).build())
          private val auditSchema = new StructType()
            .add("check", StringType, nullable = false)
            .add("problems", LongType, nullable = false)
            .add("detail", StringType, nullable = false)
          override def call(input: InternalRow): util.Iterator[Scan] = {
            // named distinctly from LocalScan.rows: inside the anon
            // class the member would shadow the local (a self tail
            // call that spins forever)
            val auditRows = storeF().audit(str(input, 0)).map {
              case (c, n, d) => new GenericInternalRow(Array[Any](
                UTF8String.fromString(c), n, UTF8String.fromString(d)))
                : InternalRow
            }.toArray
            util.List.of[Scan](new LocalScan {
              override def readSchema(): StructType = auditSchema
              override def rows(): Array[InternalRow] = auditRows
            }).iterator()
          }
        }
    }
    case "create_branch" => proc(storeF, name,
      "fork a named branch from a snapshot (-1 = current head)",
      Seq("table" -> StringType, "branch" -> StringType,
        "from_version" -> LongType)) { (st, r) =>
      st.createBranch(str(r, 0), str(r, 1), r.getLong(2))
    }
    case "drop_branch" => proc(storeF, name,
      "retire a branch and reclaim its exclusive data",
      Seq("table" -> StringType, "branch" -> StringType)) { (st, r) =>
      st.dropBranch(str(r, 0), str(r, 1))
      st.currentVersion(str(r, 0))
    }
    case "fast_forward" => proc(storeF, name,
      "publish a branch head onto an unmoved main (one manifest CAS)",
      Seq("table" -> StringType, "branch" -> StringType)) { (st, r) =>
      st.fastForward(str(r, 0), str(r, 1))
    }
    case "merge_branch" => proc(storeF, name,
      "three-way partition-granular merge of a branch into main",
      Seq("table" -> StringType, "branch" -> StringType)) { (st, r) =>
      st.mergeBranch(str(r, 0), str(r, 1))
    }
    case "expire_branch" => proc(storeF, name,
      "burn branch history beyond the last `keep` commits (base kept)",
      Seq("table" -> StringType, "branch" -> StringType,
        "keep" -> IntegerType)) { (st, r) =>
      st.expireBranchSnapshots(str(r, 0), str(r, 1), r.getInt(2))
      st.branchHeadVersion(str(r, 0), str(r, 1))
    }
    case "cherry_pick" => proc(storeF, name,
      "apply one live snapshot's own delta onto the head",
      Seq("table" -> StringType, "version" -> LongType)) { (st, r) =>
      st.cherryPick(str(r, 0), r.getLong(1))
    }
    case "expire_snapshots" => proc(storeF, name,
      "apply the retention policy; returns live snapshot count",
      Seq("table" -> StringType)) { (st, r) =>
      val t = str(r, 0)
      st.expireSnapshots(t)
      st.versions(t).size.toLong
    }
    case other => throw new NoSuchElementException(
      s"graft has no procedure `$other`; available: ${names.mkString(", ")}")
  }

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i) match {
      case null => throw new IllegalArgumentException(
        s"procedure argument $i must not be NULL")
      case s: UTF8String => s.toString
    }

  private val outSchema =
    new StructType().add("version", LongType, nullable = false)

  private def proc(storeF: () => VersionedTableStore, procName: String,
      desc: String, params: Seq[(String, DataType)])(
      run: (VersionedTableStore, InternalRow) => Long): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, t) =>
              ProcedureParameter.in(n, t).build()
            }.toArray
          override def call(input: InternalRow): util.Iterator[Scan] = {
            val v = run(storeF(), input)
            util.List.of[Scan](new LocalScan {
              override def readSchema(): StructType = outSchema
              override def rows(): Array[InternalRow] =
                Array(new GenericInternalRow(Array[Any](v)))
            }).iterator()
          }
        }
    }
}
