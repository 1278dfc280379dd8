package graft

import org.apache.spark.sql._

/** Throwaway local profiling/plan harness (Test scope only; not part
  * of the engine). Run: sbt "Test/runMain graft.ProbeMain". */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warmup
    _root_.graft.queries.RelationalQueries.tpchQ1(spark, dir).collect()

    // where does dedup_clusters time go? pairs vs CC loop
    time("minhash pairs alone")(
      _root_.graft.ops.DedupOps.dedupMinhashLsh(spark, dir).collect())
    time("dedup_clusters total")(
      _root_.graft.ops.DedupOps.dedupClusters(spark, dir).collect())

    spark.stop()
  }
}
