package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for the reworked bigram LM op (Test
  * scope only). Run: sbt "Test/runMain graft.BigramProbeMain". */
object BigramProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup (documents-only so upsampled doc corpora work too)
    _root_.graft.ops.TextOps.textStats(spark, dir).write
      .format("noop").mode("overwrite").save()

    val docs = _root_.graft.core.Tables.documents(spark, dir)
    val t = _root_.graft.ops.TextOps.tokens(col("text"))
    val pairs = transform(t, (x, i) => struct(x.as("w"), get(t, i + 1).as("nxt")))
    time("explode+groupBy only (no ckpt)") {
      docs.select(col("doc_id"), explode(pairs).as("p"))
        .groupBy(col("doc_id"), col("p.w").as("w"), col("p.nxt").as("nxt"))
        .agg(count(lit(1)).as("cnt")).write.format("noop").mode("overwrite").save()
    }
    val pairTf = time("pairTf materializeOnce") {
      _root_.graft.ops.DedupOps.materializeOnce(docs
        .select(col("doc_id"), explode(pairs).as("p"))
        .groupBy(col("doc_id"), col("p.w").as("w"), col("p.nxt").as("nxt"))
        .agg(count(lit(1)).as("cnt")))
    }
    time("count")(println("rows=" + pairTf.count()))
    time("rest of op (model+score)") {
      _root_.graft.ops.TextOps.bigramLogprob(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    time("full op again") {
      _root_.graft.ops.TextOps.bigramLogprob(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
