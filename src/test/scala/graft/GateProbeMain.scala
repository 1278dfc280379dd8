package graft

import org.apache.spark.sql._

/** Gate-threshold probe: bigram/unigram LM at a given corpus with the
  * model-broadcast gate forced ON (huge) vs OFF (0) -- which side is
  * faster once the model table is corpus-proportional? (Test scope.)
  * Run: sbt "Test/runMain graft.GateProbeMain <dir>". */
object GateProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[gate] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(): Unit =
      _root_.graft.ops.TextOps.bigramLogprob(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // warmup
    _root_.graft.ops.TextOps.unigramLogprob(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      spark.conf.set("spark.graft.text.modelBroadcastMaxInputBytes",
        Long.MaxValue.toString)
      time(s"bigram BROADCAST model (round $round)")(run())
      spark.conf.set("spark.graft.text.modelBroadcastMaxInputBytes", "0")
      time(s"bigram SHUFFLED model (round $round)")(run())
    }
    spark.stop()
  }
}
