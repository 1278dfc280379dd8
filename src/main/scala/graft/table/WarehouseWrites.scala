package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The write surface [[UpsertWriter]] merges through -- implemented
  * destructively by [[TableStore]] (staged swap, no history) and
  * append-only by [[VersionedTableStore]] (immutable snapshots +
  * manifest pointer, Iceberg-style). MERGE logic is written once
  * against this trait; the store choice decides the commit protocol.
  */
trait WarehouseWrites {
  def spark: SparkSession

  /** S9: existence probe. */
  def exists(name: String): Boolean

  /** S2: current-state table scan. */
  def read(name: String): DataFrame

  /** S5/S6: create or full-replace. */
  def createOrReplace(df: DataFrame, name: String,
      partitionBy: Seq[String] = Nil): Unit

  /** Full-rewrite commit used by unpartitioned / widening merges. */
  private[table] def swapIn(df: DataFrame, name: String,
      partitionBy: Seq[String]): Unit

  /** Partition-local commit: replace ONLY the hive partitions present
    * in `df`, leaving every other partition's files untouched. */
  def overwritePartitions(df: DataFrame, name: String,
      partitionBy: Seq[String]): Unit
}
