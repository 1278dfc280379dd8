package graft

import org.apache.spark.sql._

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

    def show(label: String)(df: DataFrame): Unit = {
      println(s"\n================ $label ================")
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(6000))
    }

    // r6 late additions: range join, retention, mixture, bm25
    show("j5_range_join")(SparkEntry.queries("j5_range_join")(spark, dir))
    show("w6_retention_cohort")(SparkEntry.queries("w6_retention_cohort")(spark, dir))
    show("p12_mixture_sample")(SparkEntry.queries("p12_mixture_sample")(spark, dir))
    show("text_bm25")(SparkEntry.queries("text_bm25")(spark, dir))

    spark.stop()
  }
}
