package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All loads are lazy scans --
  * filters/projections applied downstream push into the parquet reader
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Sessions.adopt(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** The generator has shipped `events.ts` as either TIMESTAMP(NANOS)
    * (which Spark reads as a nanos Long under
    * legacy.parquet.nanosAsLong) or plain timestamp[us] (read as
    * TIMESTAMP_NTZ). DuckDB's effective precision is microseconds
    * either way (`epoch_ns(ts)//1000` on the oracle side), so the
    * canonical cross-engine timestamp is the us truncation: `ts_us`
    * (long, us since epoch), `ts` (TIMESTAMP, us precision; the
    * session timezone is pinned UTC so the NTZ cast is
    * value-preserving), and `ts_ns` (nanos long) for callers that
    * keyed on raw nanos.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns DIV 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        raw
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", col("ts_us") * 1000L)
          .withColumn("ts", timestamp_micros(col("ts_us")))
    }
  }
}
