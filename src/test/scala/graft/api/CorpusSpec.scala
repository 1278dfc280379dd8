package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables
import graft.ops.DedupOps

class CorpusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id").as("my_id"), col("text").as("body"))

  test("prepare output is exact- and near-dup free with a total split") {
    val out = Corpus.prepare(docs, col("my_id"), col("body")).cache()
    val n = out.count()
    assert(n > 0)
    // no two survivors share a content key or a component
    assert(out.select("content_key").distinct().count() === n)
    assert(out.select("component").distinct().count() === n)
    // split is total and only the three values
    assert(out.filter(!col("split").isin("train", "val", "test")).count() === 0)
    // survivors of near-dup clusters are the component minima
    val comps = out.select(col("component"), col("doc_id")).as[(Long, Long)].collect()
    comps.foreach { case (c, id) => assert(id === c) }
    out.unpersist()
  }

  test("prepare is deterministic under repartitioning") {
    val a = Corpus.prepare(docs, col("my_id"), col("body"))
      .collect().map(_.toString).sorted.toSeq
    val b = Corpus.prepare(docs.repartition(13), col("my_id"), col("body"))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("no surviving pair is near-duplicate (the graph was fully contracted)") {
    val out = Corpus.prepare(docs, col("my_id"), col("body"))
    val residual = Dedup.minhashPairs(out, col("doc_id"), col("text"))
    assert(residual.count() === 0)
  }

  test("paragraph stage runs FIRST: boilerplate cut before gating and dedup") {
    // two long docs identical except for shared boilerplate and one
    // content sentence; a third doc that is ONLY boilerplate.
    // Without the paragraph stage: doc 3 survives (unique enough
    // text). With it: doc 3 strips to nothing -> too_short reject;
    // docs 1/2 lose the shared header but keep their content.
    val boiler = "terms of service apply to all visitors of this site"
    val docs = Seq(
      (1L, s"$boiler\nalpha beta gamma delta facts one two three"),
      (2L, s"$boiler\nomega psi chi phi facts four five six seven"),
      (3L, boiler)
    ).toDF("my_id", "body")
    val seg = (d: org.apache.spark.sql.DataFrame,
        id: org.apache.spark.sql.Column, tx: org.apache.spark.sql.Column) =>
      DedupOps.paragraphsOf(d, id, tx)
    val out = Corpus.prepare(docs, col("my_id"), col("body"),
      paragraphSegmenter = Some(seg))
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    // doc 1 (first occurrence) keeps the boilerplate; doc 2 loses it
    assert(out(1L) === s"$boiler alpha beta gamma delta facts one two three")
    assert(out(2L) === "omega psi chi phi facts four five six seven")
    // without the stage, the pure-boilerplate doc passes the gate
    val without = Corpus.prepare(docs, col("my_id"), col("body"))
      .select("doc_id").as[Long].collect().toSet
    assert(without.contains(3L))
  }

  test("prepareStats accounts monotone per-stage loss") {
    val stats = Corpus.prepareStats(docs, col("my_id"), col("body"))
      .as[(String, Long, Long)].collect().toSeq
    assert(stats.map(_._1) ===
      Seq("input", "quality_filter", "exact_dedup", "near_dup_dedup"))
    stats.foreach { case (_, in, outN) => assert(outN <= in) }
    // chained: each stage's input is the previous stage's output
    stats.sliding(2).foreach {
      case Seq((_, _, prevOut), (_, in, _)) => assert(in === prevOut)
      case _ =>
    }
  }

  test("containment stage merges sub-document duplicates minhash misses") {
    // doc 2 is doc 1's first paragraph verbatim; doc 1 adds enough
    // distinct vocabulary that symmetric jaccard stays under the
    // minhash threshold while containment(|A inter B| / min) = 1.0.
    // doc 3 is unrelated. All pass the quality gates.
    // sizes pick the sketch's high-recall regime: the contained doc
    // holds ~half the container's winnow windows, so a bottom-6
    // fingerprint collision is near-certain (recall ~1-(1/2)^6)
    val small = (1 to 50).map(i => s"alpha$i beta$i").mkString(" ")
    val tail = (1 to 30).map(i => s"unique$i filler$i extra$i").mkString(" ")
    val d = Seq((1L, s"$small $tail"), (2L, small),
      (3L, (1 to 40).map(i => s"other$i word$i").mkString(" ")))
      .toDF("my_id", "body")
    val plain = Corpus.prepare(d, col("my_id"), col("body"))
    // minhash alone: the embedded doc SURVIVES (low symmetric jaccard)
    assert(plain.select("doc_id").as[Long].collect().sorted === Array(1L, 2L, 3L))
    val contained = Corpus.prepare(d, col("my_id"), col("body"),
      containmentThreshold = Some(DedupOps.ContainmentThreshold))
    // containment edges merge 1 and 2 into one component; min id wins
    assert(contained.select("doc_id").as[Long].collect().sorted === Array(1L, 3L))
    // leakage safety holds for the merged component too: survivor's
    // split hashes the component id
    assert(contained.filter(col("doc_id") === 1L)
      .select("component").as[Long].head() === 1L)
  }

  test("exportShards: one file per shard, reproducible membership AND order") {
    val out1 = java.nio.file.Files.createTempDirectory("graft-shards1").toString + "/s"
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/s"
    Corpus.exportShards(docs, col("my_id"), out1, shardDocs = 40)
    Corpus.exportShards(docs.repartition(9), col("my_id"), out2, shardDocs = 40)
    val n = docs.count()
    val back = spark.read.parquet(out1)
    assert(back.count() === n)
    // every shard is ONE file and holds exactly shardDocs docs
    // except the last; pos_in_shard is dense 0..size-1
    val sizes = back.groupBy("shard").count().orderBy("shard")
      .as[(Long, Long)].collect()
    sizes.dropRight(1).foreach { case (_, c) => assert(c === 40L) }
    val shardDirs = new java.io.File(out1).listFiles()
      .filter(_.getName.startsWith("shard="))
    shardDirs.foreach { d =>
      assert(d.listFiles().count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".") &&
        !f.getName.endsWith(".crc")) === 1,
        s"${d.getName} not packed to one file")
    }
    assert(back.groupBy("shard").agg(min("pos_in_shard"), max("pos_in_shard"),
        count(lit(1))).collect().forall(r =>
      r.getLong(1) === 0L && r.getLong(2) === r.getLong(3) - 1))
    // identical layout from a differently-partitioned input
    val a = back.select("my_id", "global_pos", "shard", "pos_in_shard")
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out2)
      .select("my_id", "global_pos", "shard", "pos_in_shard")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    // rows inside a shard file are STORED in training order: a
    // no-sort read returns pos_in_shard ascending per shard file
    val shard0 = shardDirs.minBy(_.getName)
    val stored = spark.read.parquet(shard0.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head.getPath)
      .select("pos_in_shard").as[Long].collect().toSeq
    assert(stored === stored.sorted, "shard file rows not in training order")
  }

  test("quality rejects name a reason and are disjoint from the output") {
    val rejects = Corpus.qualityRejects(docs, col("my_id"), col("body"))
    val out = Corpus.prepare(docs, col("my_id"), col("body"))
    assert(rejects.filter(col("reject_reason").isNull).count() === 0)
    assert(out.join(rejects, Seq("doc_id"), "left_semi").count() === 0)
  }

  test("trainingChunks: chunks cover the prepared corpus, bins never cross splits") {
    import spark.implicits._
    val prepared = Corpus.prepare(docs, col("my_id"), col("body"))
    val chunks = Corpus.trainingChunks(docs, col("my_id"), col("body"))
    // every prepared doc appears, with its full token count covered
    val covered = chunks.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.sum(col("n_chunk_tokens")).as("covered"))
    val mismatch = prepared
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n"))
      .join(covered, Seq("doc_id"), "full_outer")
      .filter(col("n").isNull || col("covered").isNull || col("n") =!= col("covered"))
    assert(mismatch.count() === 0)
    // a (split, bin) cell holds chunks of exactly one split by
    // construction; offsets are contiguous within each split stream
    val rows = chunks.select("split", "doc_id", "chunk_id", "n_chunk_tokens", "start_offset")
      .as[(String, Long, Int, Long, Long)].collect()
      .groupBy(_._1).values
    rows.foreach { stream =>
      var expected = 0L
      stream.sortBy(r => (r._2, r._3)).foreach { case (_, d, c, n, off) =>
        assert(off === expected, s"gap at ($d,$c)")
        expected = off + n
      }
    }
  }
}
