package graft.table.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.graft.{GraftBatchWrite, GraftScan, GraftScanPlanning}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.VersionedTableStore

/** One SQL row-level statement (UPDATE / MERGE INTO / rewrite-path
  * DELETE) against a graft table, as Spark's GROUP-BASED copy-on-write:
  * groups ARE the store's partitions.
  *
  *  - '''Scan''': a group-atomic read of the head snapshot
  *    ([[org.apache.spark.sql.graft.GraftRowOpScanBuilder]] — filters
  *    prune whole partitions, never rows). Spark's runtime group
  *    filtering additionally narrows it to partitions that actually
  *    hold matched rows (the scan is
  *    `SupportsRuntimeV2Filtering`-capable), so an UPDATE touching 3
  *    of 3,000 date partitions reads — and rewrites — exactly 3.
  *  - '''Write''': executor-parallel staged parquet
  *    ([[GraftBatchWrite]]) promoted by ONE manifest CAS
  *    ([[VersionedTableStore.commitStagedReplacing]]): replaced
  *    groups = precisely the partitions the scan's final plan read
  *    ([[GraftScan.plannedRels]]); rows that MOVED partition (an
  *    UPDATE assigning a partition column, MERGE inserts) land as
  *    appends beside untouched partitions' existing dirs.
  *  - '''Isolation''': serializable — the commit rejects if the head
  *    moved past the scanned snapshot, and a no-match statement
  *    (nothing read, nothing written) burns no snapshot at all.
  */
class GraftRowLevelOp(st: VersionedTableStore, tableName: String,
    snapshot: GraftSnapshot, cmd: Command,
    branch: String = "", wap: String = "") extends RowLevelOperation {

  @volatile private var scanRef: GraftScan = _

  // The directory-layout schema (identity fields + hidden DERIVED
  // fields) the file index parses rels with — distinct from the
  // table-visible schema on hidden-partitioned layouts
  private val partitionSchema: StructType = {
    val full = StructType.fromDDL(snapshot.schemaDDL)
    graft.table.PartitionTransforms.derivedSchema(snapshot.partitionBy, full)
  }
  // ID-stamped (graft.table.FieldIds): the scan resolves pre-rename
  // files by field ID (the stamp must ride the schema Spark prunes
  // from — see GraftTable.dataSchema); the staged replacement files
  // are re-stamped with the same IDs by GraftBatchWrite, and scan
  // outputs are cleaned at GraftScan.readSchema. Identity partition
  // columns live in paths; a transform's SOURCE column is an ordinary
  // data column inside every file.
  private val dataSchema: StructType = {
    val full = StructType.fromDDL(snapshot.schemaDDL)
    val idSources =
      graft.table.PartitionTransforms.identitySources(snapshot.partitionBy)
        .toSet
    graft.table.FieldIds.stamp(
      StructType(full.filterNot(f => idSources(f.name))),
      snapshot.fieldIds)
  }
  // identity partition fields only — what the TABLE-visible row
  // carries next to the data columns (hidden columns never surface)
  private val identityPartitionSchema: StructType = {
    val full = StructType.fromDDL(snapshot.schemaDDL)
    StructType(graft.table.PartitionTransforms
      .identitySources(snapshot.partitionBy).map(full.apply))
  }

  override def command(): Command = cmd

  override def description(): String =
    s"graft $cmd on $tableName @ v${snapshot.version}"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GraftScanPlanning.rowOpScanBuilder(st.spark,
      GraftScanPlanning.fileIndex(st.spark, partitionSchema,
        snapshot.entries, snapshot.stats),
      // the TABLE-visible row: data columns + identity partition
      // columns (hidden derived columns exist only in the file
      // index's layout schema and in filters projected onto it)
      StructType(dataSchema ++ identityPartitionSchema), dataSchema, options,
      partitionSchema, s => scanRef = s,
      mor = if (snapshot.deletes.isEmpty) Nil
        else org.apache.spark.sql.graft.MorKeys.build(st.spark,
          snapshot.deletes),
      layout = snapshot.partitionBy)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val (dirId, stagingPath) = st.newStagingDir(tableName)
        def dropStaging(): Unit = {
          val p = new Path(stagingPath)
          val fs = p.getFileSystem(st.spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          ()
        }
        new GraftBatchWrite(st.spark, info, snapshot.partitionBy, stagingPath,
          fieldIds = snapshot.fieldIds,
          onCommit = written => {
            val replaced = Option(scanRef).map(_.plannedRels).getOrElse(
              throw new IllegalStateException(
                s"row-level $cmd on $tableName committed before its scan " +
                  "was planned"))
            if (written.isEmpty && replaced.isEmpty) dropStaging() // no-match
            else st.commitStagedReplacing(tableName, dirId, written, replaced,
              expectedParent = snapshot.version, branch = branch, wap = wap)
          },
          onAbort = () => dropStaging())
      }
    }
}
