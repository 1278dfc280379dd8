package graft

import java.nio.file.Files

import org.apache.spark.sql._
import org.apache.spark.sql.functions.col

/** Write-path throughput probe for `Corpus.exportShards` (Test scope
  * only; results recorded in BENCH_sf1.md). Times the full assignment
  * + join + repartition + partitioned write at a given corpus dir and
  * reports docs/s, chars/s, and the shard-file layout. Run:
  * sbt "Test/runMain graft.ShardExportProbeMain <docsDir> <label> [shardDocs]"
  */
object ShardExportProbeMain {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val label = args(1)
    val shardDocs = if (args.length > 2) args(2).toInt else 4096
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    val nDocs = docs.count()
    val nChars = docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head().getLong(0)
    val out = Files.createTempDirectory(s"graft-shardprobe-$label")
      .toString + "/shards"
    val t0 = System.nanoTime()
    _root_.graft.api.Corpus.exportShards(docs, col("doc_id"), out,
      shardDocs = shardDocs)
    val secs = (System.nanoTime() - t0) / 1e9
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard="))
    val files = shardDirs.map(_.listFiles().count(f => f.isFile &&
      f.getName.endsWith(".parquet")))
    println(f"[shardprobe] label=$label docs=$nDocs chars=$nChars " +
      f"shardDocs=$shardDocs shards=${shardDirs.length} " +
      f"filesPerShard=${files.max} wall=${secs}%.1fs " +
      f"docs_per_s=${nDocs / secs}%.0f chars_per_s=${nChars / secs}%.0f")
    spark.stop()
  }
}
