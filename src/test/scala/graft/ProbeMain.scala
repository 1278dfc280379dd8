package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Throwaway local profiling/plan harness (Test scope only; not part
  * of the engine). Run: sbt "Test/runMain graft.ProbeMain". */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("sim_ann_ivf", "dedup_ngram_jaccard")) {
      println(s"==== $q ====")
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
