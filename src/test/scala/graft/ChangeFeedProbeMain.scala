package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the change-feed source (manual, like ProbeMain):
  * does an incremental trigger cost the CHANGED partitions or the
  * table?
  *
  * For each table size N: build a day-partitioned versioned table of N
  * rows across 64 partitions, drain the feed once (initial snapshot
  * replay -- expected O(N)), then upsert a 100-row batch touching ONE
  * partition and drain again (expected ~flat in N). Prints one line
  * per (N, phase, seconds).
  *
  * Run: sbt "Test/runMain graft.ChangeFeedProbeMain"
  */
object ChangeFeedProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- Seq(100000L, 1000000L)) {
      val root = java.nio.file.Files.createTempDirectory(s"cfprobe$n").toString
      val vs = new graft.table.VersionedTableStore(spark, root)
      val rows = spark.range(n)
        .select(col("id").as("k"),
          (col("id") % 64).cast("long").as("day"),
          (col("id") * 7 % 1000).cast("double").as("v"))
      vs.commitFull(rows, "t", Seq("day"))
      val ckpt = java.nio.file.Files.createTempDirectory(s"cfck$n").toString
      val out = java.nio.file.Files.createTempDirectory(s"cfout$n").toString
      def drain(): Unit = {
        val q = graft.streaming.StreamingIngest
          .changeFeed(spark, vs, "t", Seq("k"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val initial = time(drain())
      // a 100-row upsert confined to one day-partition
      graft.table.UpsertWriter.upsertAll(vs, "t",
        spark.range(100).select((col("id") + n).as("k"),
          lit(3L).as("day"), lit(1.5).as("v")),
        keys = Seq("k"), partitionBy = Seq("day"))
      val incr1 = time(drain())
      // and a quiet drain: pure per-trigger overhead
      val quiet = time(drain())
      println(f"CFPROBE n=$n%8d initial=$initial%7.2f s  incremental=$incr1%6.2f s  quiet=$quiet%6.2f s")
    }
    spark.stop()
  }
}
