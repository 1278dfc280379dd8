package graft

import org.apache.spark.sql.functions._

/** Scale probe for r13's WAP-staged row-level DML (Test scope only):
  * does routing an UPDATE through write-audit-publish cost more than
  * the same UPDATE direct? The claim: staging IS the same group
  * rewrite, just landed as an invisible manifest — the only extra
  * work is the publish CAS (O(manifest)). Times a one-day UPDATE
  * direct vs staged+published at growing day counts (constant rows
  * per day).
  * Run: sbt "Test/runMain graft.WapDmlProbeMain". */
object WapDmlProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val perDay = 200000L
    for (days <- Seq(8, 32, 128)) {
      val root =
        java.nio.file.Files.createTempDirectory(s"graft-wapdml-$days").toString
      val cat = s"gwap$days"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.table.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val vs = new _root_.graft.table.VersionedTableStore(spark, root)
      val df = spark.range(days * perDay).select(
        col("id").as("k"),
        (col("id") % 1000).as("v"),
        concat(lit("d"), (col("id") % days).cast("string")).as("day"))
      vs.commitFull(df, "t", Seq("day"), statsColumns = Seq("v"))
      spark.table(s"$cat.default.t").filter(col("day") === "d0").count()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val direct = time {
        spark.sql(s"UPDATE $cat.default.t SET v = v + 1 " +
          "WHERE day = 'd1' AND v > 500")
      }
      val staged = time {
        spark.conf.set("spark.graft.wap.id", "probe")
        try spark.sql(s"UPDATE $cat.default.t SET v = v + 1 " +
          "WHERE day = 'd2' AND v > 500")
        finally spark.conf.unset("spark.graft.wap.id")
        spark.sql(s"CALL $cat.system.publish_staged('t', 'probe')")
      }
      val n = spark.table(s"$cat.default.t").count()
      println(f"[wapdml] days=$days%4d rows=${days * perDay}%10d " +
        f"direct=$direct%6.2f s staged+publish=$staged%6.2f s (rows: $n)")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
    spark.stop()
  }
}
