package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale probe for round-12 metadata evolution (manual, like
  * BranchProbeMain): are renameColumn / widenColumn /
  * addColumnWithDefault / setColumnDefault O(manifest) or O(table)?
  * And do the two operations that are O(data) BY CONTRACT —
  * addCheckConstraint's validation scan and a bounded batch change
  * query — scale with the data they promise to scan (the table, and
  * the CHANGED partition respectively)?
  *
  * For each table size N: a day-partitioned (64 dirs) table, then
  *
  *  - rename + widen + add-default + set-default (expected ~flat:
  *    one manifest CAS each, zero data I/O);
  *  - a post-evolution read rollup over the renamed/widened/defaulted
  *    columns (the honest O(N) control, proving the metadata ops left
  *    a correct table behind);
  *  - addCheckConstraint (expected O(N): the one-time validation
  *    scan — the industry-standard ADD CONSTRAINT cost);
  *  - a guarded one-partition commit under the constraint (expected
  *    ~flat in N: enforcement scans the COMMIT's files only);
  *  - a batch change query over that one-partition commit (expected
  *    ~flat in N: snapshotDiff prunes the 63 shared dirs).
  *
  * Run: sbt "Test/runMain graft.AlterProbeMain"
  */
object AlterProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    for (n <- Seq(100000L, 1000000L, 3000000L)) {
      val root = java.nio.file.Files.createTempDirectory(s"alprobe$n").toString
      val vs = new graft.table.VersionedTableStore(spark, root)
      val rows = spark.range(n)
        .select(col("id").as("k"),
          (col("id") % 64).cast("long").as("day"),
          (col("id") % 1000).cast("int").as("amt"))
      vs.commitFull(rows, "t", Seq("day"))

      val (tRename, _) = time(vs.renameColumn("t", "amt", "amount"))
      val (tWiden, _) = time(vs.widenColumn("t", "amount", LongType))
      val (tAddDef, _) = time(
        vs.addColumnWithDefault("t", "tier",
          org.apache.spark.sql.types.StringType, "'base'"))
      val (tSetDef, _) = time(
        vs.setColumnDefault("t", "tier", Some("'hot'")))
      // O(N) control + correctness audit: old files under the new
      // name/width, defaults materialized
      val (tScan, audit) = time {
        val df = vs.read("t")
        df.agg(sum(col("amount")), count(when(col("tier") === "base", 1)))
          .collect().head
      }
      val expectSum = (0L until n).map(_ % 1000).sum
      require(audit.getLong(0) == expectSum && audit.getLong(1) == n,
        s"audit failed at n=$n: $audit")

      val (tCheck, _) = time(
        vs.addCheckConstraint("t", "amt_pos", "amount >= 0"))
      // guarded one-partition commit: enforcement reads ITS files only
      val (tGuarded, _) = time(vs.commitPartitions(
        rows.filter(col("day") === 0L)
          .withColumn("amount", col("amt").cast("long") + 1).drop("amt")
          .withColumn("tier", lit("d0")), "t", Seq("day")))
      // bounded change query over that single-partition commit
      val head = vs.currentVersion("t")
      val (tChanges, nChanged) = time {
        spark.read.format("graft-changes")
          .option("root", vs.root).option("table", "t")
          .option("keys", "k")
          .option("fromVersion", (head - 1).toString)
          .option("toVersion", head.toString)
          .load().count()
      }
      require(nChanged == (n - 1) / 64 + 1,
        s"change count drifted at n=$n: $nChanged")

      println(f"n=$n%8d rename=$tRename%6.3fs widen=$tWiden%6.3fs " +
        f"addDefault=$tAddDef%6.3fs setDefault=$tSetDef%6.3fs | " +
        f"scanControl=$tScan%6.3fs addCheck(O(N))=$tCheck%6.3fs | " +
        f"guardedCommit=$tGuarded%6.3fs batchChanges=$tChanges%6.3fs")
    }
    spark.stop()
  }
}
