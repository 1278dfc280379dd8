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
    import spark.implicits._

    def show(label: String)(df: DataFrame): Unit = {
      println(s"\n================ $label ================")
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(4000))
    }

    // r6: readWhere -- does the residual range filter push into the scan?
    val root = java.nio.file.Files.createTempDirectory("probe-stats").toString
    val vs = new _root_.graft.table.VersionedTableStore(spark, root)
    vs.commitFull(Seq((1, "d1"), (9, "d1"), (100, "d2"), (1000, "d3"))
      .toDF("k", "day"), "pt", Seq("day"), statsColumns = Seq("k"))
    show("readWhere k in [0,50]")(vs.readWhere("pt", "k", 0, 50))

    spark.stop()
  }
}
