package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** PCA gate band probe: actual projection variance vs model
  * eigenvalue per component, plus means and cross correlations --
  * picks the tolerance bands from measured residuals. (Test scope.)
  * Run: sbt "Test/runMain graft.PcaGateProbeMain <sfDir>". */
object PcaGateProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import _root_.graft.ops.SimilarityOps
    val emb = _root_.graft.core.Tables.embeddings(spark, dir)
    val model = SimilarityOps.pcaFit(emb)
    val k = 4
    val proj = SimilarityOps.pcaProjectOf(emb, model, k)
    val dec = (j: Int) => col(s"pc$j").cast("decimal(18,6)")
    val moments =
      (1 to k).map(j => sum(dec(j)).cast("decimal(38,6)").as(s"s$j")) ++
      (1 to k).flatMap(i => (i to k).map(j =>
        sum(dec(i) * dec(j)).cast("decimal(38,12)").as(s"sp${i}_$j")))
    val r = proj.agg(count(lit(1)).as("n"), moments: _*).head()
    val n = r.getLong(0); val nD = n.toDouble
    val sm = (1 to k).map(j =>
      r.getDecimal(r.fieldIndex(s"s$j")).doubleValue()).toArray
    def sp(i: Int, j: Int): Double =
      r.getDecimal(r.fieldIndex(s"sp${i}_$j")).doubleValue()
    def covOf(i: Int, j: Int): Double =
      (sp(i, j) - sm(i - 1) * sm(j - 1) / nD) / (nD - 1.0)
    println(s"[pca] n=$n eigenvalues=${model.eigenvalues.take(6).mkString(",")}")
    for (j <- 1 to k) {
      val v = covOf(j, j); val ev = model.eigenvalues(j - 1)
      println(f"[pca] pc$j var=$v%.8f ev=$ev%.8f ratio-1=${v / ev - 1.0}%.6e mean=${sm(j - 1) / nD}%.6e")
    }
    for (i <- 1 to k; j <- i + 1 to k) {
      val c = covOf(i, j) / math.sqrt(covOf(i, i) * covOf(j, j))
      println(f"[pca] corr($i,$j)=$c%.6e")
    }
    spark.stop()
  }
}
