package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode, UnsafeProjection}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Executor-parallel parquet write into a versioned-store staging dir
  * — the write half of the catalog's group-based row-level operations
  * (SQL UPDATE / MERGE INTO / non-translatable DELETE).
  *
  * Each task writes rows into hive-layout `rel` dirs under a PRIVATE
  * per-attempt temp dir; at task commit the files RENAME into the
  * shared rel dirs (speculative / retried attempts never publish —
  * Spark's commit coordinator admits exactly one attempt per
  * partition, and losers' files stay in `_tmp`, deleted wholesale at
  * job commit). The driver's `commit` then promotes the staged dir
  * with one manifest CAS (`VersionedTableStore.commitStagedReplacing`
  * via `onCommit`) — data I/O fully distributed, metadata one file.
  *
  * Declares `RequiresDistributionAndOrdering`: clustered + sorted by
  * the partition columns, so each task holds ONE open parquet writer
  * at a time (rows arrive grouped by rel) — at any scale the writer
  * memory is one row group, not one per partition value.
  *
  * Parquet encoding rides Spark's own `ParquetFileFormat.prepareWrite`
  * factory — compression, timestamp modes, legacy-format flags all
  * behave exactly as `df.write.parquet`.
  */
class GraftBatchWrite(spark: SparkSession, info: LogicalWriteInfo,
    partitionBy: Seq[String], stagingPath: String,
    onCommit: Set[String] => Unit, onAbort: () => Unit,
    fieldIds: Seq[(String, Int)] = Nil)
    extends Write with BatchWrite with RequiresDistributionAndOrdering {

  private val rowSchema: StructType = info.schema()

  override def description(): String = s"graft staged write -> $stagingPath"
  override def toBatch: BatchWrite = this

  // Clustering/sorting target the SOURCE columns (for identity
  // layouts those ARE the partition columns; for hidden transforms
  // the derived value is a pure function of its source, so source
  // clustering co-locates each derived value's rows too — except
  // bucket, whose hash scrambles order; the writer fans out there,
  // see GraftDataWriter). V2 transform expressions in the
  // distribution would need a FunctionCatalog round-trip; source
  // columns resolve everywhere.
  override def requiredDistribution(): Distribution =
    if (partitionBy.isEmpty) Distributions.unspecified()
    else Distributions.clustered(
      graft.table.PartitionTransforms.sourceNames(partitionBy)
        .map(c => Expressions.column(c): org.apache.spark.sql
          .connector.expressions.Expression).toArray)

  // clustering alone suffices for correctness; the sort keeps exactly
  // one parquet writer open per task on order-preserving layouts
  override def requiredOrdering(): Array[SortOrder] =
    graft.table.PartitionTransforms.sourceNames(partitionBy)
      .map(c => Expressions.sort(Expressions.column(c),
        SortDirection.ASCENDING)).toArray

  override def distributionStrictlyRequired(): Boolean = false

  override def createBatchWriterFactory(
      physInfo: PhysicalWriteInfo): DataWriterFactory = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    // file schema carries the table's column-identity metadata so the
    // parquet writer stamps field IDs (graft.table.FieldIds invariant:
    // every file of a ledgered table records its columns' IDs).
    // Identity partition columns live in paths; a TRANSFORM's source
    // column is an ordinary data column inside every file.
    val idSources =
      graft.table.PartitionTransforms.identitySources(partitionBy).toSet
    val fileSchema = graft.table.FieldIds.stamp(StructType(
      rowSchema.filterNot(f => idSources(f.name))), fieldIds)
    val owf = new ParquetFileFormat()
      .prepareWrite(cs, job, Map.empty, fileSchema)
    new GraftDataWriterFactory(rowSchema, partitionBy, fileSchema,
      stagingPath, owf, new SerializableConfiguration(job.getConfiguration),
      graft.table.PartitionTransforms.StoreTz)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(s"$stagingPath/_tmp")
    val fs = tmp.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true) // losers' unpublished files
    onCommit(messages.flatMap {
      case m: GraftWriteMessage => m.rels
    }.toSet)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = onAbort()
}

case class GraftWriteMessage(rels: Set[String]) extends WriterCommitMessage

/** Exactly-once streaming writes into a versioned-store table
  * (`df.writeStream.toTable("graft.default.t")`). Each micro-batch
  * epoch stages executor-written parquet under its OWN dir
  * (`<base>-e<epochId>`) through the same per-attempt-temp +
  * commit-coordinator discipline as [[GraftBatchWrite]], then
  * `commit(epochId)` promotes it as ONE file-level append commit
  * stamped with a `queryId:epochId` transaction marker — a replayed
  * epoch (post-crash re-execution) finds its marker live and retires
  * as a no-op, which is what makes the sink exactly-once end to end
  * (offsets in the checkpoint, results in the manifest, dedup by
  * txn). Appends are commutative: concurrent writers retry-safely
  * interleave, and an empty epoch burns no snapshot.
  *
  * Declares clustered+sorted distribution on the partition columns —
  * Spark's micro-batch planner honors [[RequiresDistributionAndOrdering]]
  * for v2 streaming sinks, so each task keeps ONE open parquet writer
  * exactly like the batch path. */
class GraftStreamingWrite(spark: SparkSession, info: LogicalWriteInfo,
    partitionBy: Seq[String], stageBasePath: String,
    onEpochCommit: (Long, Set[String]) => Unit,
    onEpochAbort: Long => Unit,
    fieldIds: Seq[(String, Int)] = Nil)
    extends Write with RequiresDistributionAndOrdering
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val rowSchema: StructType = info.schema()

  override def description(): String =
    s"graft streaming append -> $stageBasePath-e<epoch>"
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = this

  override def requiredDistribution(): Distribution =
    if (partitionBy.isEmpty) Distributions.unspecified()
    else Distributions.clustered(
      graft.table.PartitionTransforms.sourceNames(partitionBy)
        .map(c => Expressions.column(c): org.apache.spark.sql
          .connector.expressions.Expression).toArray)

  override def requiredOrdering(): Array[SortOrder] =
    graft.table.PartitionTransforms.sourceNames(partitionBy)
      .map(c => Expressions.sort(Expressions.column(c),
        SortDirection.ASCENDING)).toArray

  override def distributionStrictlyRequired(): Boolean = false

  override def createStreamingWriterFactory(physInfo: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    // ID-stamped like the batch path; commitStagedAppend re-validates
    // the ledger at every epoch (a rewrite mid-stream rejects loudly).
    // Transform sources stay data columns (batch-path rationale).
    val idSources =
      graft.table.PartitionTransforms.identitySources(partitionBy).toSet
    val fileSchema = graft.table.FieldIds.stamp(StructType(
      rowSchema.filterNot(f => idSources(f.name))), fieldIds)
    val owf = new ParquetFileFormat()
      .prepareWrite(cs, job, Map.empty, fileSchema)
    new GraftStreamingWriterFactory(rowSchema, partitionBy, fileSchema,
      stageBasePath, owf, new SerializableConfiguration(job.getConfiguration),
      graft.table.PartitionTransforms.StoreTz)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(s"$stageBasePath-e$epochId/_tmp")
    val fs = tmp.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true) // losers' unpublished files
    onEpochCommit(epochId, messages.flatMap {
      case m: GraftWriteMessage => m.rels
    }.toSet)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = onEpochAbort(epochId)
}

private[graft] class GraftStreamingWriterFactory(rowSchema: StructType,
    partitionBy: Seq[String], fileSchema: StructType, stageBasePath: String,
    owf: OutputWriterFactory, conf: SerializableConfiguration, tz: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(rowSchema, partitionBy, fileSchema,
      s"$stageBasePath-e$epochId", owf, conf, tz, partitionId, taskId)
}

private[graft] class GraftDataWriterFactory(rowSchema: StructType,
    partitionBy: Seq[String], fileSchema: StructType, stagingPath: String,
    owf: OutputWriterFactory, conf: SerializableConfiguration, tz: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(rowSchema, partitionBy, fileSchema, stagingPath,
      owf, conf, tz, partitionId, taskId)
}

/** One task's writer. Non-partition columns project into the file
  * row; partition values (identity columns directly, hidden-transform
  * columns DERIVED from their source on the fly) render to the hive
  * rel path with the SAME escaping the store's own writer (Spark hive
  * layout) uses, so the staged rels line up with manifest rels
  * byte-for-byte.
  *
  * Writer discipline: order-preserving layouts (identity and
  * monotonic transforms) arrive sorted by source, so one writer is
  * open at a time. A layout with a NON-monotonic transform (bucket —
  * the hash scrambles the sort) FANS OUT instead: one open writer per
  * rel under the CURRENT monotonic-prefix segments, with the whole
  * pool closed and evicted when that prefix moves on (the sort makes
  * an old prefix non-revisiting) — open writers stay bounded by the
  * bucket count, not days-seen x buckets. The Iceberg fanout-writer
  * trade, memory for sortedness, with the memory half actually
  * bounded. */
private[graft] class GraftDataWriter(rowSchema: StructType,
    partitionBy: Seq[String], fileSchema: StructType, stagingPath: String,
    owf: OutputWriterFactory, conf: SerializableConfiguration, tz: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val attemptDir = s"$stagingPath/_tmp/attempt-$partitionId-$taskId"

  private val pSpecs = graft.table.PartitionTransforms.specs(partitionBy)
  private val fanout = !pSpecs.forall(_.monotonic)

  // Row layout binds LAZILY against the first row: a group-based
  // ReplaceData plan prepends an operation-marker INT column
  // (RowDeltaUtils.WRITE*/; observed value 6 = WRITE_WITH_METADATA)
  // that Spark's plain writing task hands through unprojected -- the
  // writer detects the extra leading field and offsets every ordinal.
  private var markerOffset = -1
  private var fileProjection: UnsafeProjection = _
  private var partCasts: Seq[Cast] = Nil

  private def bind(row: InternalRow): Unit = {
    markerOffset = row.numFields - rowSchema.length match {
      case 0 => 0
      case 1 => 1
      case d => throw new IllegalStateException(
        s"graft staged write: row has ${row.numFields} fields for schema " +
          s"${rowSchema.toDDL} -- unsupported layout")
    }
    fileProjection = UnsafeProjection.create(
      fileSchema.fieldNames.toIndexedSeq.map { n =>
        val i = rowSchema.fieldIndex(n)
        BoundReference(i + markerOffset, rowSchema(i).dataType,
          rowSchema(i).nullable)
      })
    // partition value -> path segment string: the transform derivation
    // (identity = passthrough) then Cast-to-string in LEGACY mode
    // (what the hive-layout writer renders), then hive escaping
    partCasts = pSpecs.map { sp =>
      val i = rowSchema.fieldIndex(sp.source)
      Cast(sp.deriveCatalyst(
        BoundReference(i + markerOffset, rowSchema(i).dataType,
          rowSchema(i).nullable)),
        StringType, Option(tz), EvalMode.LEGACY)
    }
  }

  private val ctx = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
      "graft", partitionId), TaskType.MAP, partitionId), taskId.toInt))

  private var currentRel: String = null
  private var currentWriter: OutputWriter = _
  private val fanoutWriters =
    scala.collection.mutable.LinkedHashMap[String, OutputWriter]()
  // rows arrive sorted by the layout's SOURCE columns (requiredOrdering),
  // so the leading run of MONOTONIC specs' segments is non-revisiting:
  // once that prefix moves on, every writer under the old prefix is
  // dead. Evicting on prefix change bounds open fanout writers to the
  // non-monotonic suffix's cardinality (the bucket count) instead of
  // prefix-values-seen x buckets — a days(ts)+bucketN(id) task holds N
  // writers, not days x N.
  private val monoPrefixLen = pSpecs.indexWhere(!_.monotonic) match {
    case -1 => pSpecs.length
    case i => i
  }
  private var currentPrefix: String = null
  private var fileCount = 0
  private val written = scala.collection.mutable.Set[String]()

  private def segsOf(row: InternalRow): Seq[String] =
    pSpecs.indices.map { k =>
      val v = partCasts(k).eval(row)
      val s = if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(v.toString)
      s"${ExternalCatalogUtils.escapePathName(pSpecs(k).derivedName)}=$s"
    }

  private def openWriter(rel: String): OutputWriter = {
    val dir = if (rel == ".") attemptDir else s"$attemptDir/$rel"
    val file = f"part-$partitionId%05d-$taskId-$fileCount%03d" +
      owf.getFileExtension(ctx)
    fileCount += 1
    written += rel
    owf.newInstance(s"$dir/$file", fileSchema, ctx)
  }

  override def write(row: InternalRow): Unit = {
    if (markerOffset < 0) bind(row)
    if (markerOffset == 1) {
      // only full-row writes are in the group contract; a delta marker
      // (DELETE/UPDATE/INSERT = 1..4) reaching a group writer means a
      // plan shape this write does not implement -- fail, don't drop
      val op = row.getInt(0)
      require(op == 5 || op == 6,
        s"graft staged write: unexpected row operation marker $op")
    }
    val segs = if (partitionBy.isEmpty) Nil else segsOf(row)
    val rel = if (segs.isEmpty) "." else segs.mkString("/")
    val w =
      if (fanout) {
        val prefix = segs.take(monoPrefixLen).mkString("/")
        if (prefix != currentPrefix) {
          fanoutWriters.values.foreach(_.close())
          fanoutWriters.clear()
          currentPrefix = prefix
        }
        fanoutWriters.getOrElseUpdate(rel, openWriter(rel))
      }
      else {
        if (rel != currentRel) {
          if (currentWriter != null) {
            currentWriter.close(); currentWriter = null
          }
          currentRel = rel
          currentWriter = openWriter(rel)
        }
        currentWriter
      }
    w.write(fileProjection(row))
  }

  /** Publish: rename this attempt's rel dirs' files into the shared
    * staging rels. Runs only for the attempt the commit coordinator
    * admitted, so concurrent attempts never collide; file names carry
    * (partitionId, taskId) so retries of OTHER partitions cannot
    * clash either. */
  private def closeAll(): Unit = {
    if (currentWriter != null) { currentWriter.close(); currentWriter = null }
    fanoutWriters.values.foreach(_.close())
    fanoutWriters.clear()
  }

  override def commit(): WriterCommitMessage = {
    closeAll()
    val fs = new Path(stagingPath).getFileSystem(conf.value)
    written.foreach { rel =>
      val src = if (rel == ".") new Path(attemptDir)
        else new Path(s"$attemptDir/$rel")
      val dst = if (rel == ".") new Path(stagingPath)
        else new Path(s"$stagingPath/$rel")
      fs.mkdirs(dst)
      fs.listStatus(src).filter(_.isFile).foreach { st =>
        if (!fs.rename(st.getPath, new Path(dst, st.getPath.getName)))
          throw new java.io.IOException(
            s"publish failed: ${st.getPath} -> $dst")
      }
    }
    fs.delete(new Path(attemptDir), true)
    GraftWriteMessage(written.toSet)
  }

  override def abort(): Unit = {
    closeAll()
    val fs = new Path(attemptDir).getFileSystem(conf.value)
    fs.delete(new Path(attemptDir), true)
    ()
  }

  override def close(): Unit = closeAll()
}
