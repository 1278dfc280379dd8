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
class TableStore(val spark: SparkSession, val root: String) extends WarehouseWrites {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(name: String): String = s"$root/$name"

  /** S9: existence probe (the reference's try-spark.table pattern,
    * build_stock_fact_table.py:89-95). */
  def exists(name: String): Boolean = fs.exists(new Path(path(name)))

  /** S2: catalog table scan. Registered tables are equally readable
    * as `spark.table(name)` (see [[register]]). */
  def read(name: String): DataFrame = spark.read.parquet(path(name))

  /** Register `name` in the SESSION CATALOG as an external parquet
    * table over its store path -- the `spark.table(...)` /
    * `DESCRIBE` / ad-hoc-SQL surface the reference gets from its
    * Glue-cataloged warehouse (build_stock_aggregations.py:45-55).
    * Every write re-registers, so catalog schema and partition
    * metadata always reflect the files on disk. */
  /** Catalog-qualified identifier: a single-part name resolves TEMP
    * VIEWS first in Spark SQL, so an unqualified
    * `DROP TABLE IF EXISTS t` with a same-named temp view in the
    * session is silently diverted AWAY from the catalog table -- the
    * next CREATE then collides with the table the drop was supposed
    * to remove. Every catalog statement here addresses the table
    * through the session catalog's default namespace, which temp
    * views cannot shadow. */
  private def qualified(name: String): String =
    s"spark_catalog.default.`$name`"

  def register(name: String, partitionBy: Seq[String] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(name)}")
    spark.sql(
      s"CREATE TABLE ${qualified(name)} USING parquet LOCATION '${path(name)}'")
    if (partitionBy.nonEmpty)
      spark.sql(s"ALTER TABLE ${qualified(name)} RECOVER PARTITIONS")
    spark.catalog.refreshTable(qualified(name))
  }

  /** [[register]] for a table whose partitioning is discovered from
    * the directory layout rather than passed in (attach-time use). */
  def registerDiscovered(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(name)}")
    spark.sql(
      s"CREATE TABLE ${qualified(name)} USING parquet LOCATION '${path(name)}'")
    val partitioned = spark.catalog.listColumns(qualified(name))
      .collect().exists(_.isPartition)
    if (partitioned)
      spark.sql(s"ALTER TABLE ${qualified(name)} RECOVER PARTITIONS")
    spark.catalog.refreshTable(qualified(name))
  }

  /** Create or full-replace a BUCKETED table: rows are hash-clustered
    * into `buckets` files per partition by `bucketCols` (and
    * optionally sorted within buckets). Two tables bucketed the same
    * way join on the bucket key with NO shuffle exchange -- the
    * co-located join that turns the warehouse's hottest join key into
    * a one-time layout cost instead of a per-query shuffle. Bucketing
    * metadata lives in the session catalog, so readers must come in
    * through `spark.table(name)`, not the raw path. */
  def createOrReplaceBucketed(df: DataFrame, name: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty && buckets > 0)
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(name)}")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path(name))
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(qualified(name))
  }

  /** S5/S6: create or full-replace (CTAS / createOrReplace). */
  def createOrReplace(df: DataFrame, name: String, partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
    register(name, partitionBy)
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
    register(name, partitionBy)
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
    register(name, partitionBy)
  }

  def drop(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    fs.delete(new Path(path(name)), true)
  }
}
