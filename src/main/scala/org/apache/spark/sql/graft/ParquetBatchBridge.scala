package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Batch
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, NoopCache}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Visibility bridge: build a DSv2 [[Batch]] that reads every parquet
  * file under a directory with a pinned schema, by delegating to
  * Spark's own ParquetScan (vectorized reader, full type coverage)
  * instead of hand-rolling a parquet PartitionReader. Used by the
  * change-feed MicroBatchStream: each micro-batch materializes its
  * changelog to a staging dir, then serves it through this Batch's
  * InputPartitions/ReaderFactory. Lives under org.apache.spark.sql
  * for access to the `sql`-private scan internals; contains no Spark
  * modifications. */
object ParquetBatchBridge {
  def batchFor(spark: SparkSession, dir: String, schema: StructType): Batch = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // NoopCache: a staging dir can be rebuilt under the same path
    // after a crashed trigger -- a shared listing cache would serve
    // the dead file names
    val index = new InMemoryFileIndex(cs, Seq(new Path(dir)),
      Map.empty[String, String], Some(schema), NoopCache, None, None)
    ParquetScanBuilder(cs, index, schema, schema,
      CaseInsensitiveStringMap.empty()).build().toBatch
  }
}
