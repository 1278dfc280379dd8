package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Throwaway local profiling harness (Test scope only; not part of the
  * engine). Run: sbt "Test/runMain graft.ProbeMain". */
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
    // warmup: pay JVM/codegen startup outside the measurements
    _root_.graft.core.Tables.documents(spark, dir).count()
    t("warmup proj") {
      _root_.graft.core.Tables.documents(spark, dir).repartition(64)
        .select(col("doc_id"), _root_.graft.ops.DedupOps.hashedShingles(col("text"), 3).as("th")).count()
    }
    val docs = t("shingle proj+sig+bands") {
      val d = _root_.graft.core.Tables.documents(spark, dir).repartition(64)
        .select(col("doc_id"), _root_.graft.ops.DedupOps.hashedShingles(col("text"), 3).as("th"))
        .withColumn("bands",
          _root_.graft.ops.Hashing.lshBands(_root_.graft.ops.Hashing.minhashSig(col("th"), 16), 4, 4))
      d.localCheckpoint(true)
    }
    t("candidate count") {
      val b = docs.select(col("doc_id"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
      val a2 = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
      val b2 = b.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
        col("doc_id").as("doc_b"))
      println("candidates: " + a2.join(b2, col("band_idx") === col("bi") &&
        col("band_hash") === col("bh") && col("doc_a") < col("doc_b")).count())
    }
    t("full dedupNgramJaccard") {
      println("pairs: " + _root_.graft.ops.DedupOps.dedupNgramJaccard(spark, dir).count())
    }
    t("full dedupNgramJaccard 2nd") {
      println("pairs: " + _root_.graft.ops.DedupOps.dedupNgramJaccard(spark, dir).count())
    }
    t("tokens-only hash proj") {
      _root_.graft.core.Tables.documents(spark, dir).repartition(64)
        .select(col("doc_id"), _root_.graft.ops.DedupOps.hashedTokenSet(col("text")).as("th")).count()
    }
    t("full dedupMinhashLsh") {
      println("pairs: " + _root_.graft.ops.DedupOps.dedupMinhashLsh(spark, dir).count())
    }
    spark.stop()
  }
}
