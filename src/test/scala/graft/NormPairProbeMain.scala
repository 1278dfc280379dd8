package graft

import org.apache.spark.sql._

/** Pair-density probe: raw vs normalized MinHash pair counts on a
  * corpus (Test scope only). The upsampled corpora keep replicas
  * token-disjoint via `_i` suffixes; normalization SPLITS at the
  * underscore, so replicas collide -- this probe quantifies it.
  * Run: sbt "Test/runMain graft.NormPairProbeMain <dir>". */
object NormPairProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = _root_.graft.ops.DedupOps.dedupMinhashLsh(spark, dir).count()
    val norm = _root_.graft.ops.DedupOps.dedupMinhashNorm(spark, dir).count()
    println(s"[pairs] dir=$dir raw=$raw norm=$norm")
    spark.stop()
  }
}
