package graft

import graft.core.Sessions

/** One-off diagnostic for the r13->r14 dedup_clusters drift question:
  * prints the CC loop's round count and per-phase wall times so the
  * iteration-count theory can be confirmed or killed with one number
  * (box interference cannot change a deterministic round count). */
object ClustersProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { run =>
      val pairs = t(s"run$run:lsh_pairs")(
        graft.ops.DedupOps.dedupMinhashLsh(spark, dir)
          .select(org.apache.spark.sql.functions.col("doc_a").as("src"),
            org.apache.spark.sql.functions.col("doc_b").as("dst"))
          .localCheckpoint(true))
      println(s"PROBE run$run:n_pairs " + pairs.count())
      val cc = t(s"run$run:cc")(
        graft.ops.DedupOps.connectedComponents(
          graft.core.Tables.documents(spark, dir)
            .select(org.apache.spark.sql.functions.col("doc_id").as("id")),
          pairs))
      println(s"PROBE run$run:n_rows " + cc.count())
    }
    spark.stop()
  }
}
