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
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    _root_.graft.core.Tables.documents(spark, dir).count()
    t("embed_lsh warmup") {
      println("pairs: " + _root_.graft.ops.DedupOps.dedupEmbedLsh(spark, dir).count())
    }
    t("embed_lsh warm") {
      _root_.graft.ops.DedupOps.dedupEmbedLsh(spark, dir).count()
    }
    spark.stop()
  }
}
