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

  /** `events` stores TIMESTAMP(NANOS) which Spark reads as a nanos
    * Long (legacy.parquet.nanosAsLong). DuckDB's effective precision
    * is microseconds, so the canonical cross-engine timestamp is the
    * us truncation: `ts_us` (long, us since epoch) and `ts`
    * (timestamp, us precision). Raw nanos stay available as `ts_ns`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
