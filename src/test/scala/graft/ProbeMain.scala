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

    // r6 late additions: snapshot diff, curriculum bins, funnel
    show("s17_snapshot_diff")(SparkEntry.queries("s17_snapshot_diff")(spark, dir))
    show("p13_curriculum_bins")(SparkEntry.queries("p13_curriculum_bins")(spark, dir))
    show("w7_funnel")(SparkEntry.queries("w7_funnel")(spark, dir))

    spark.stop()
  }
}
