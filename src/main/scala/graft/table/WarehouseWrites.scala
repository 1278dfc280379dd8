package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** `DELETE FROM name WHERE condition` -- rows where the condition is
    * TRUE are removed (NULL keeps the row, SQL DELETE semantics).
    * Default implementation: full filtered rewrite through the staged
    * swap. [[VersionedTableStore]] overrides with partition-granular
    * copy-on-write (untouched partitions keep their files; emptied
    * partitions leave the manifest). */
  def deleteWhere(name: String, condition: Column,
      partitionBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val kept = read(name).filter(not(coalesce(condition, lit(false))))
    swapIn(kept, name, partitionBy)
  }

  /** `UPDATE name SET assignments WHERE condition` -- rows where the
    * condition is TRUE take the assigned expressions (evaluated
    * against the pre-update row); NULL/FALSE rows pass through.
    * Default implementation: full rewrite through the staged swap.
    * [[VersionedTableStore]] overrides with partition-granular
    * copy-on-write. */
  def updateWhere(name: String, condition: Column,
      assignments: Map[String, Column],
      partitionBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val df = read(name)
    val cols = df.columns.toSeq
    assignments.keys.foreach(c => require(cols.contains(c),
      s"UPDATE assigns unknown column `$c` (table has ${cols.mkString(",")})"))
    val fires = coalesce(condition, lit(false))
    swapIn(df.select(cols.map { c =>
      assignments.get(c)
        .map(a => when(fires, a).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*), name, partitionBy)
  }
}
