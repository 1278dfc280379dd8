package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Path-addressed parquet table store -- the engine's stand-in for the
  * reference's Glue-cataloged Iceberg warehouse (SURVEY.md S1.1).
  *
  * Each table is a parquet directory under `root`, optionally
  * hive-partitioned (`partitionBy`), giving the same partition-pruned
  * scans the reference gets from Iceberg partition specs
  * (build_stock_aggregations.py:120,183,239). Commits go through a
  * staging-directory swap -- not a true snapshot isolation like
  * Iceberg, but atomic-enough for the reference's single-writer
  * pipelines (its own guard is max_concurrent_runs per Glue job,
  * terraform/modules/glue/main.tf:141).
  */
class TableStore(val spark: SparkSession, val root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(name: String): String = s"$root/$name"

  /** S9: existence probe (the reference's try-spark.table pattern,
    * build_stock_fact_table.py:89-95). */
  def exists(name: String): Boolean = fs.exists(new Path(path(name)))

  /** S2: catalog table scan. */
  def read(name: String): DataFrame = spark.read.parquet(path(name))

  /** S5/S6: create or full-replace (CTAS / createOrReplace). */
  def createOrReplace(df: DataFrame, name: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
  }

  /** Staged atomic-swap rewrite: write to `<name>__staging`, then move
    * into place. Readers racing the swap see old-or-new, never a
    * partial write. */
  private[table] def swapIn(df: DataFrame, name: String, partitionBy: Seq[String]): Unit = {
    val staging = s"${path(name)}__staging"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(staging)
    val dst = new Path(path(name))
    val bak = new Path(s"${path(name)}__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new Path(staging), dst)
    fs.delete(bak, true)
  }

  /** Dynamic partition overwrite: replace ONLY the hive partitions
    * present in `df`, leaving all other partitions' files untouched
    * -- the partition-local commit a daily MERGE needs on a deep
    * table. */
  def overwritePartitions(df: DataFrame, name: String, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    // per-write option, NOT a session-conf mutation: a session-level
    // "dynamic" would silently turn every later full-replace of a
    // partitioned table into a partition-local overwrite
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(path(name))
  }

  def drop(name: String): Unit = fs.delete(new Path(path(name)), true)
}
