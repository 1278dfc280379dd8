package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for branch metadata operations (manual, like
  * MorProbeMain): are createBranch / fastForward / mergeBranch /
  * cherryPick O(manifest) or O(table)?
  *
  * For each table size N: build a day-partitioned (64 dirs) table,
  * then measure
  *
  *  - `createBranch` (expected ~flat in N: one manifest copy CAS);
  *  - a ONE-partition branch commit (expected ~flat: writes one
  *    partition's rows, shares 63 dirs);
  *  - `mergeBranch` after a disjoint one-partition main commit
  *    (expected ~flat: dir-set algebra + one CAS, zero data I/O);
  *  - `dropBranch` of a fresh second branch (expected ~flat);
  *  - a branch-head read rollup (the honest O(N) control).
  *
  * Every phase is value-audited: the merged head must hold exactly
  * the branch's day-0 rewrite, main's day-1 rewrite, and the
  * original rows elsewhere.
  *
  * Run: sbt "Test/runMain graft.BranchProbeMain"
  */
object BranchProbeMain {
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

    // 1x / 10x / 30x: branch metadata ops should stay ~flat while the
    // full-scan control grows with n
    for (n <- Seq(100000L, 1000000L, 3000000L)) {
      val root = java.nio.file.Files.createTempDirectory(s"brprobe$n").toString
      val vs = new graft.table.VersionedTableStore(spark, root)
      def rows(mark: String) = spark.range(n)
        .select(col("id").as("k"),
          (col("id") % 64).cast("long").as("day"),
          concat(lit(mark), col("id")).as("v"))
      vs.commitFull(rows("base"), "t", Seq("day"))

      val (tCreate, _) = time(vs.createBranch("t", "dev"))
      // one-partition rewrite ON the branch (day 0)
      val (tBranchCommit, _) = time(vs.commitPartitions(
        rows("branch").filter(col("day") === 0L), "t", Seq("day"),
        branch = "dev"))
      // disjoint one-partition rewrite on MAIN (day 1)
      vs.commitPartitions(rows("main").filter(col("day") === 1L), "t",
        Seq("day"))
      val (tMerge, _) = time(vs.mergeBranch("t", "dev"))
      // audit the merged values
      val merged = vs.read("t")
      val day0 = merged.filter(col("day") === 0L &&
        col("v").startsWith("branch")).count()
      val day1 = merged.filter(col("day") === 1L &&
        col("v").startsWith("main")).count()
      val rest = merged.filter(col("day") >= 2L &&
        col("v").startsWith("base")).count()
      def residueCount(r: Long) = n / 64 + (if (r < n % 64) 1L else 0L)
      require(day0 == residueCount(0) && day1 == residueCount(1) &&
        rest == n - residueCount(0) - residueCount(1),
        s"merge audit failed: $day0/$day1/$rest at n=$n")
      val (tDrop, _) = time { vs.dropBranch("t", "dev") }
      // honest O(N) control: a full branch-head scan rollup
      vs.createBranch("t", "ctl")
      val (tScan, cnt) = time(vs.readBranch("t", "ctl").count())
      require(cnt == n, s"control scan saw $cnt of $n")
      println(f"n=$n%8d createBranch=$tCreate%6.3fs oneDirBranchCommit=" +
        f"$tBranchCommit%6.3fs mergeBranch=$tMerge%6.3fs dropBranch=" +
        f"$tDrop%6.3fs fullScan(control)=$tScan%6.3fs")
    }
    spark.stop()
  }
}
