package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql._

/** Throughput probe for the composed streaming path
  * (`corpusIntakeToWarehouse`: quality gate -> chunk -> streaming
  * exact dedup -> per-batch MERGE into the versioned store) at 1x and
  * 10x corpus scale (Test scope only; results recorded in
  * BENCH_sf1.md). Run:
  * sbt "Test/runMain graft.StreamIntakeBenchMain <docsDir> <label> [files]"
  */
object StreamIntakeBenchMain {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val label = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 8
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tmp(p: String) = Files.createTempDirectory(p).toString
    val src = tmp(s"graft-sbench-src-$label")
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs.count()
    docs.repartition(nFiles).write.mode("overwrite").parquet(src)

    val docStream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val store = new _root_.graft.table.VersionedTableStore(
      spark, tmp(s"graft-sbench-wh-$label"))
    val ckpt = tmp(s"graft-sbench-ckpt-$label")

    val t0 = System.nanoTime()
    _root_.graft.streaming.StreamingIngest
      .corpusIntakeToWarehouse(docStream, store, "chunks", ckpt,
        s"sbench_$label")
      .awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val chunks = store.read("chunks").count()
    def duBytes(p: String): Long = {
      val root = Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    val ckptB = duBytes(ckpt)
    val stateB = duBytes(s"$ckpt/state")
    println(f"[sbench] label=$label docs=$nDocs batches=$nFiles wall=$wall%.1fs " +
      f"docs_per_s=${nDocs / wall}%.0f chunks=$chunks " +
      f"chunks_per_s=${chunks / wall}%.0f ckpt_bytes=$ckptB state_bytes=$stateB")
    spark.stop()
  }
}
