package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the catalog's group-based row-level operations
  * (manual, like ChangeFeedProbeMain): does a SQL UPDATE cost the
  * MATCHED partitions or the table?
  *
  * For each table size N: build a day-partitioned (64 dirs) catalog
  * table of N rows, then run
  *
  *  - an UPDATE whose predicate matches ONE partition (expected
  *    ~flat in N: runtime group filtering restricts the rewrite's
  *    scan AND its staged write to that partition), and
  *  - an UPDATE matching every partition (expected O(N): a full
  *    rewrite is the honest floor).
  *
  * Prints one line per (N, phase, seconds, versions-created).
  *
  * Run: sbt "Test/runMain graft.RowOpProbeMain"
  */
object RowOpProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- Seq(100000L, 1000000L)) {
      val root = java.nio.file.Files.createTempDirectory(s"rlprobe$n").toString
      val cat = s"rlp$n"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.table.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val vs = new graft.table.VersionedTableStore(spark, root)
      val rows = spark.range(n)
        .select(col("id").as("k"),
          (col("id") % 64).cast("long").as("day"),
          (col("id") * 7 % 1000).cast("double").as("v"))
      vs.commitFull(rows, "t", Seq("day"))

      // warm the session's plan/codegen paths on a no-match statement
      spark.sql(s"UPDATE $cat.default.t SET v = v + 1 WHERE day = -1")

      val one = time {
        spark.sql(s"UPDATE $cat.default.t SET v = v + 1 " +
          "WHERE day = 7 AND k % 3 = 0")
      }
      val all = time {
        spark.sql(s"UPDATE $cat.default.t SET v = v + 1 WHERE k % 3 = 0")
      }
      val head = vs.currentVersion("t")
      // value audit: day-7 evens got +2, other evens +1, odds 0
      val expect = spark.range(n).select(
        (col("id") * 7 % 1000).cast("double").as("v0"),
        (col("id") % 64).as("day"), col("id").as("k"))
        .select(sum(when(col("k") % 3 === 0,
          when(col("day") === 7, col("v0") + 2).otherwise(col("v0") + 1))
          .otherwise(col("v0")))).head().getDouble(0)
      val got = spark.sql(s"SELECT sum(v) FROM $cat.default.t").head().getDouble(0)
      println(s"ROWOP-AUDIT n=$n expect=$expect got=$got match=${expect == got}")
      println(f"ROWOP n=$n%8d one-partition-update $one%7.2f s   " +
        f"all-partitions-update $all%7.2f s   head=v$head")
      println(s"ROWOP-VERSIONS ${vs.versions("t").mkString(",")} commits=" +
        new java.io.File(s"$root/t/_commits").list().sorted.mkString(","))
      val headRels = spark.sql(
        s"SELECT count(*) FROM $cat.default.t.partitions WHERE " +
          "data_dir LIKE '%/rl-%'").head().getLong(0)
      println(s"ROWOP-REWRITTEN head rewrote $headRels of 64 partitions")
    }
    spark.stop()
  }
}
