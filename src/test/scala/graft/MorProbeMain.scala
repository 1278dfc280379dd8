package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for merge-on-read deletes (manual, like
  * RowOpProbeMain): is a takedown O(keys) or O(table)?
  *
  * For each table size N: build a day-partitioned (64 dirs) catalog
  * table of N rows, then measure
  *
  *  - `deleteKeys` of a FIXED 1,000-key set (expected ~flat in N:
  *    one small parquet write + one manifest CAS, no data touched);
  *  - the merge-on-read read tax: the same rollup with the delete
  *    pending vs after compact (expected: a bounded per-row filter
  *    cost while pending);
  *  - `compact` (expected O(N): the one honest full-rewrite step).
  *
  * Every phase is value-audited (counts must reflect exactly the
  * 1,000 takedown keys at both sizes).
  *
  * Run: sbt "Test/runMain graft.MorProbeMain"
  */
object MorProbeMain {
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

    for (n <- Seq(100000L, 1000000L)) {
      val root = java.nio.file.Files.createTempDirectory(s"morprobe$n").toString
      val cat = s"morp$n"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.table.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val vs = new graft.table.VersionedTableStore(spark, root)
      vs.commitFull(spark.range(n)
        .select(col("id").as("k"),
          (col("id") % 64).cast("long").as("day"),
          (col("id") * 7 % 1000).cast("double").as("v")),
        "t", Seq("day"))

      def rollup(): Long =
        spark.sql(s"SELECT count(*) FROM $cat.default.t").collect()
          .head.getLong(0)
      rollup() // warm plan/codegen paths

      val keys = spark.range(1000).select((col("id") * 997).as("k"))
        .filter(col("k") < n)
      val nKeys = keys.count()
      val (tDel, _) = time(vs.deleteKeys("t", keys, Seq("k")))
      val (tMorRead, morCount) = time(rollup())
      val (tCompact, _) = time(vs.compact("t"))
      val (tCleanRead, cleanCount) = time(rollup())
      assert(morCount == n - nKeys, s"mor read: $morCount != ${n - nKeys}")
      assert(cleanCount == n - nKeys,
        s"post-compact read: $cleanCount != ${n - nKeys}")
      println(f"n=$n%8d keys=$nKeys deleteKeys=$tDel%6.2fs " +
        f"morRead=$tMorRead%6.2fs compact=$tCompact%6.2fs " +
        f"cleanRead=$tCleanRead%6.2fs")
    }
    spark.stop()
  }
}
