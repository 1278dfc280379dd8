package graft.table.catalog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.VersionedTableStore

/** Iceberg-style inspection tables, addressed as a third name part:
  *
  * {{{
  * SELECT * FROM graft.default.orders.history     -- one row per live snapshot
  * SELECT * FROM graft.default.orders.partitions  -- head manifest's (rel -> dir)
  * SELECT * FROM graft.default.orders.stats       -- head manifest column stats
  * }}}
  *
  * All three are MANIFEST-granular: a handful of driver-side rows per
  * table (bounded by live snapshots x partitions, the same listings
  * every store read already parses), served as a [[LocalScan]] — no
  * jobs, no executors, correct at any table size because manifests
  * are size-bounded by retention, not by data volume.
  *
  * `history.committed_at_ms` is the CAS wall-clock stamp (-1 for
  * pre-stamp manifests), `parent` the head version the writer
  * observed (-1 before lineage stamping) — both verbatim from the
  * manifest, so the output doubles as the audit surface
  * [[VersionedTableStore.snapshots]] reads.
  */
private[catalog] object GraftMetadataTables {

  val names: Set[String] = Set("history", "partitions", "stats", "staged",
    "deletes", "branches")

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  def apply(st: VersionedTableStore, table: String, meta: String): Table =
    meta match {
      case "history" =>
        val rows = st.versions(table).map { v =>
          val m = st.snapshotView(table, Some(v))
          new GenericInternalRow(Array[Any](m.version, m.parent,
            m.committedAtMs, s(m.partitionBy.mkString(",")),
            m.entries.size.toLong, s(m.schemaDDL)))
        }
        local(s"$table.history", new StructType()
          .add("version", LongType, nullable = false)
          .add("parent", LongType, nullable = false)
          .add("committed_at_ms", LongType, nullable = false)
          .add("partition_by", StringType, nullable = false)
          .add("n_partitions", LongType, nullable = false)
          .add("schema_ddl", StringType, nullable = false), rows)
      case "partitions" =>
        val m = st.snapshotView(table, None)
        val rows = m.entries.map { case (rel, dir) =>
          new GenericInternalRow(Array[Any](m.version, s(rel), s(dir)))
        }
        local(s"$table.partitions", new StructType()
          .add("version", LongType, nullable = false)
          .add("partition", StringType, nullable = false)
          .add("data_dir", StringType, nullable = false), rows)
      case "staged" =>
        val rows = st.stagedSnapshots(table).map { case (v, wap) =>
          new GenericInternalRow(Array[Any](v, s(wap)))
        }
        local(s"$table.staged", new StructType()
          .add("version", LongType, nullable = false)
          .add("wap_id", StringType, nullable = false), rows)
      case "branches" =>
        val rows = st.branches(table).map { case (b, head, fork) =>
          new GenericInternalRow(Array[Any](s(b), head, fork))
        }
        local(s"$table.branches", new StructType()
          .add("branch", StringType, nullable = false)
          .add("head_version", LongType, nullable = false)
          .add("fork_version", LongType, nullable = false), rows)
      case "deletes" =>
        val rows = st.pendingDeletes(table).map { case (dir, cols) =>
          new GenericInternalRow(Array[Any](s(dir), s(cols)))
        }
        local(s"$table.deletes", new StructType()
          .add("delete_dir", StringType, nullable = false)
          .add("key_columns", StringType, nullable = false), rows)
      case "stats" =>
        val m = st.snapshotView(table, None)
        val rows = m.stats.map { case (rel, c, mn, mx) =>
          new GenericInternalRow(Array[Any](m.version, s(rel), s(c),
            s(mn), s(mx)))
        }
        local(s"$table.stats", new StructType()
          .add("version", LongType, nullable = false)
          .add("partition", StringType, nullable = false)
          .add("column", StringType, nullable = false)
          .add("min", StringType, nullable = false)
          .add("max", StringType, nullable = false), rows)
    }

  private def local(tableName: String, tableSchema: StructType,
      rowSeq: Seq[InternalRow]): Table =
    new Table with SupportsRead {
      override def name(): String = s"graft.default.$tableName"
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new LocalScan {
            override def readSchema(): StructType = tableSchema
            override def rows(): Array[InternalRow] = rowSeq.toArray
          }
        }
    }
}
