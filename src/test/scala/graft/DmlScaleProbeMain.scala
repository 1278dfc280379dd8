package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Scale probe for the versioned store's copy-on-write DML (Test scope
  * only): does a day-scoped DELETE cost the day or the table? Builds
  * partitioned tables of growing day-counts (constant rows per day),
  * then times `deleteWhere(day = X AND v > t)` on one day. The CoW
  * claim predicts ~flat times: the detection scan partition-prunes to
  * the one day, the rewrite touches one partition, and manifest work
  * is linear in partition COUNT (tiny strings), not data.
  * Run: sbt "Test/runMain graft.DmlScaleProbeMain". */
object DmlScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val perDay = 200000L
    for (days <- Seq(8, 32, 128)) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-dml-$days").toString
      val vs = new _root_.graft.table.VersionedTableStore(spark, root)
      val df = spark.range(days * perDay).select(
        col("id").as("k"),
        (col("id") % 1000).as("v"),
        concat(lit("d"), (col("id") % days).cast("string")).as("day"))
      vs.commitFull(df, "t", Seq("day"), statsColumns = Seq("v"))
      // warm the reader path
      vs.read("t").filter(col("day") === "d0").count()
      val t0 = System.nanoTime()
      vs.deleteWhere("t", col("day") === "d1" && col("v") > 500)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = vs.read("t").count()
      println(f"[dml] days=$days%4d rows=${days * perDay}%10d " +
        f"one-day delete: $dt%6.2f s (rows after: $n)")
    }
    spark.stop()
  }
}
