package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.Schemas

/** JSONL raw zone (S1 scan / S13 sink) -- the reference's
  * `raw/stock_quotes/date=<d>/` JSONL layout
  * (lambda_function.py:158-197, build_stock_fact_table.py:28-32).
  *
  * Reading uses an explicit schema (never inference) and either one
  * `date=` partition dir (the reference's manual pruning style) or the
  * zone root, where Spark's hive-style partition discovery + a
  * `date = ...` filter prunes directories for free.
  */
object JsonlQuoteSource {
  def partitionPath(root: String, date: String): String =
    s"$root/date=$date"

  /** S13: land one day of quotes as JSONL under the date= dir. */
  def write(df: DataFrame, root: String, date: String): Unit =
    df.write.mode(SaveMode.Append).json(partitionPath(root, date))

  /** S1: read exactly one day partition, schema pinned. */
  def readDay(spark: SparkSession, root: String, date: String): DataFrame =
    spark.read.schema(Schemas.rawQuote).json(partitionPath(root, date))

  /** Read the whole zone with partition discovery; filter on the
    * `date` partition column to prune (verify via explain:
    * PartitionFilters). */
  def readZone(spark: SparkSession, root: String): DataFrame =
    spark.read
      .schema(Schemas.rawQuote.add("date", "string"))
      .option("basePath", root)
      .json(s"$root/date=*")

  /** Raw-zone retention: delete `date=` partition dirs strictly older
    * than `asOf - keepDays` -- the engine op for the reference's S3
    * lifecycle rule (terraform/modules/s3/main.tf:35-75, raw zone
    * expires at 90 days). Purely a directory-name comparison (ISO
    * dates sort lexically), no data scan; non-partition files and
    * malformed dir names are never touched. Returns the expired
    * dates. `asOf` is injectable so pipelines with a frozen clock
    * stay deterministic. */
  def expire(spark: SparkSession, root: String, keepDays: Int,
      asOf: java.time.LocalDate = java.time.LocalDate.now()): Seq[String] = {
    require(keepDays >= 0, "keepDays must be >= 0")
    val cutoff = asOf.minusDays(keepDays.toLong).toString
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("date=\\d{4}-\\d{2}-\\d{2}"))
      .map(_.getPath)
      .filter(_.getName.stripPrefix("date=") < cutoff)
      .sortBy(_.getName)
      .map { p => fs.delete(p, true); p.getName.stripPrefix("date=") }
  }
}
