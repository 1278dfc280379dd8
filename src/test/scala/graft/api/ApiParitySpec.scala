package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables
import graft.ops.{SimilarityOps, TextOps}

/** Similarity/Text facades must reproduce the table-bound query
  * functions when fed the same data under different column names. */
class ApiParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)
    .select(col("vec_id").as("eid"), col("embedding").as("e"), col("label"))
  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id").as("my_id"), col("text").as("body"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("cosineTopK matches the table-bound query") {
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val api = Similarity.cosineTopK(emb, col("eid"), col("e"), q, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.cosineTopK(spark, dir)))
  }

  test("annSignLsh matches the table-bound query") {
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val api = Similarity.annSignLsh(emb, col("eid"), col("e"), q, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.annSignLsh(spark, dir)))
  }

  test("annMultiProbe matches its table-bound query and dominates single-probe recall") {
    import spark.implicits._
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val api = Similarity.annMultiProbe(emb, col("eid"), col("e"), q, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.annMultiProbe(spark, dir)))
    // candidate superset -> per-rank cosine at least single-probe's
    def byRank(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "cosine").as[(Long, Int, Double)]
        .collect().map { case (qid2, r, c) => (qid2, r) -> c }.toMap
    val mp = byRank(SimilarityOps.annMultiProbe(spark, dir))
    val sp = byRank(SimilarityOps.annSignLsh(spark, dir))
    sp.foreach { case (key, c) => assert(mp.getOrElse(key, Double.MinValue) >= c) }
    assert(mp.size >= sp.size)
  }

  test("persistent IVF index answers exactly like the in-line annIvf") {
    val store = new graft.table.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ivf").toString)
    Similarity.buildIvfIndex(store, "ivf", emb, col("eid"), col("e"), col("label"))
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val got = Similarity.queryIvfIndex(store, "ivf", q, col("eid"), col("e"))
    val expect = Similarity.annIvf(emb, col("eid"), col("e"), col("label"),
      q, col("eid"), col("e"))
    assert(rows(got) === rows(expect))
    assert(got.collect().nonEmpty)
    // the at-rest win: the probe join carries the cell partition
    // column, so the stored corpus scan is prunable to the probed
    // cells (partition filters / dynamic pruning on cell=)
    val cellsAll = store.read("ivf_cells").inputFiles.length
    assert(cellsAll > 1, "cells table should be partitioned by cell")
  }

  test("annIvf matches the table-bound query") {
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val api = Similarity.annIvf(emb, col("eid"), col("e"), col("label"),
      q, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.annIvf(spark, dir)))
  }

  test("annIvfPq matches the table-bound query under renamed columns") {
    val q = emb.filter(col("eid") < SimilarityOps.NumQueries)
    val api = Similarity.annIvfPq(emb, col("eid"), col("e"), col("label"),
      q, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.annIvfPq(spark, dir)))
  }

  test("annIvfPq ADC is EXACT when every vector coincides with its codeword") {
    import spark.implicits._
    // dim 8, m=2, subDim=4: within each subspace every sign-init cell
    // holds ONE distinct subvector value, so the one-step codebook
    // centroid IS the subvector and PQ reconstruction is lossless --
    // ADC cosine must then equal the exact cosine bit for bit
    // (paper-derived, not engine-vs-oracle: cos(a,b) = -0.5 below)
    val a = Seq(1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0)
    val b = Seq(1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0)
    val corpus = Seq((1L, a, 0), (2L, b, 0), (3L, a, 0))
      .toDF("vid", "v", "cell")
    val queries = Seq((100L, a)).toDF("vid", "v")
    val got = Similarity.annIvfPq(corpus, col("vid"), col("v"), col("cell"),
      queries, col("vid"), col("v"), nprobe = 1, k = 10,
      subspaces = 2, subDim = 4)
      .select("match_id", "adc_cosine", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // dot(a,b) = (1-1+1-1) + (-1-1-1-1) = -4; |a||b| = 8 -> -0.5
    assert(got.toSeq === Seq((1L, 1.0, 1), (3L, 1.0, 2), (2L, -0.5, 3)))
  }

  test("LSH knobs parameterize: 16-dim embeddings, 6 planes (64 buckets)") {
    import spark.implicits._
    // a non-default deployment shape: 16-dim vectors (slice of the
    // test embeddings), 6 hyperplanes instead of 4
    val e16 = emb.select(col("eid"), slice(col("e"), 1, 16).as("e"))
    val q = e16.filter(col("eid") < SimilarityOps.NumQueries)
    val lsh = Similarity.annSignLsh(e16, col("eid"), col("e"),
      q, col("eid"), col("e"), k = 10, planes = 6, dims = 16)
    assert(lsh.count() > 0)
    // every LSH hit's cosine is the EXACT cosine: compare against the
    // brute-force ranking of the same pairs
    val n = e16.count().toInt
    val exact = Similarity.cosineTopK(e16, col("eid"), col("e"),
      q, col("eid"), col("e"), k = n)
      .select("query_id", "match_id", "cosine").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => (a, b) -> c }.toMap
    lsh.select("query_id", "match_id", "cosine").as[(Long, Long, Double)]
      .collect().foreach { case (a, b, c) => assert(exact((a, b)) === c) }
    // multi-probe at the same knobs dominates single-probe recall
    val mp = Similarity.annMultiProbe(e16, col("eid"), col("e"),
      q, col("eid"), col("e"), extraProbes = 2, k = 10, planes = 6, dims = 16)
    def byRank(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "cosine").as[(Long, Int, Double)]
        .collect().map { case (qid2, r, c) => (qid2, r) -> c }.toMap
    val m = byRank(mp); val s = byRank(lsh)
    s.foreach { case (key, c) => assert(m.getOrElse(key, Double.MinValue) >= c) }
    // and the dedup facade takes the same knobs: pairs are unique,
    // ordered, above threshold, with exact verified cosines
    val pairs = Dedup.embedLshPairs(e16, col("eid"), col("e"),
      threshold = 0.3, planes = 6, dims = 16)
      .select("vec_a", "vec_b", "cosine").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) =>
      assert(a < b); assert(c >= 0.3)
      // symmetric pair exists in the exact map when a is a query id
      if (a < SimilarityOps.NumQueries) assert(exact((a, b)) === c)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length)
  }

  test("quantizeInt8 matches the table-bound query") {
    val api = Similarity.quantizeInt8(emb, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.embQuantizeInt8(spark, dir)))
  }

  test("Text.stats matches textStats modulo the lang/stopword columns") {
    val api = Text.stats(docs, col("my_id"), col("body"))
      .select("doc_id", "n_tokens", "n_distinct_tokens", "n_chars",
        "lexical_diversity", "avg_token_len", "n_bpeish_tokens")
    val ops = TextOps.textStats(spark, dir)
      .select("doc_id", "n_tokens", "n_distinct_tokens", "n_chars",
        "lexical_diversity", "avg_token_len", "n_bpeish_tokens")
    assert(rows(api) === rows(ops))
  }

  test("Text.langId matches langId scores and prediction") {
    val api = Text.langId(docs, col("my_id"), col("body"))
    val ops = TextOps.langId(spark, dir).drop("actual_lang")
    assert(rows(api) === rows(ops))
  }

  test("Text.fingerprints matches fingerprint") {
    val api = Text.fingerprints(docs, col("my_id"), col("body"))
    assert(rows(api) === rows(TextOps.fingerprint(spark, dir)))
  }

  test("Text.tfidf and vocabTopK match the analytics queries") {
    val api = Text.tfidf(docs, col("my_id"), col("body"))
    assert(rows(api) === rows(graft.queries.AnalyticsQueries.textTfidf(spark, dir)))
    val vt = Text.vocabTopK(docs, col("body"))
    assert(rows(vt) === rows(graft.queries.AnalyticsQueries.textVocabTopk(spark, dir)))
  }

  test("Text.bm25 matches the analytics query") {
    val api = Text.bm25(docs, col("my_id"), col("body"))
    assert(rows(api) === rows(graft.queries.AnalyticsQueries.textBm25(spark, dir)))
  }

  test("Corpus.mixtureSample matches the table-bound sampler under renamed columns") {
    val renamed = Tables.documents(spark, dir)
      .select(col("doc_id").as("url"), col("source").as("origin"),
        col("n_chars").as("sz"))
    val api = Corpus.mixtureSample(renamed, col("url"), col("origin"), col("sz"),
      graft.ops.SamplingOps.MixtureWeights,
      graft.ops.SamplingOps.MixtureDefaultWeight,
      graft.ops.SamplingOps.MixtureBudgetPct)
    assert(rows(api) === rows(graft.ops.SamplingOps.mixtureSample(spark, dir)))
  }

  test("Text.charEntropy matches the table-bound query under renamed columns") {
    val api = Text.charEntropy(docs, col("my_id"), col("body"))
    assert(rows(api) === rows(TextOps.charEntropy(spark, dir)))
  }

  test("Corpus.sourceCap matches the table-bound cap under renamed columns") {
    val renamed = Tables.documents(spark, dir)
      .select(col("doc_id").as("url"), col("source").as("origin"),
        col("n_chars").as("quality"))
    val api = Corpus.sourceCap(renamed, col("url"), col("origin"),
      col("quality"), graft.ops.SamplingOps.SourceCapN)
    assert(rows(api) === rows(graft.ops.SamplingOps.sourceCap(spark, dir)))
  }

  test("Text.nbClassify matches the table-bound query under renamed columns") {
    val d = Tables.documents(spark, dir)
    val api = Text.nbClassify(
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("u"), col("text").as("b"), col("lang").as("y")),
      col("u"), col("b"), col("y"),
      d.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("u"), col("text").as("b")),
      col("u"), col("b"))
    assert(rows(api) === rows(graft.ops.TextOps.textNbClassify(spark, dir)))
  }

  test("Corpus.groupSample matches the table-bound query under renamed columns") {
    val renamed = Tables.documents(spark, dir)
      .select(col("doc_id").as("u"), col("lang").as("g"))
    val api = Corpus.groupSample(renamed, col("u"), col("g"),
      graft.ops.SamplingOps.GroupSampleN)
    assert(rows(api) === rows(graft.ops.SamplingOps.groupSample(spark, dir)))
  }

  test("Corpus.sourceCap stays exact AND salted under a STRING id column") {
    import org.apache.spark.sql.expressions.Window
    val asUrl = Tables.documents(spark, dir).select(
      concat(lit("https://ex.com/"), col("doc_id")).as("url"),
      col("source"), col("n_chars"))
    val n = graft.ops.SamplingOps.SourceCapN
    val api = Corpus.sourceCap(asUrl, col("url"), col("source"),
      col("n_chars"), n)
    // exactness vs the single-window brute force (string-ordered
    // tie-break, same as the op's id ordering)
    val brute = asUrl
      .withColumn("rank_in_source", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("url").asc)))
      .filter(col("rank_in_source") <= n)
      .select(col("url").as("doc_id"), col("source"), col("n_chars"),
        col("rank_in_source"))
    assert(rows(api) === rows(brute))
    // and the salt expression is live for strings: pmod on a raw
    // string id is NULL (one shard = the skew hazard); the hashed
    // salt must spread rows over more than one shard
    val shards = asUrl.select(
      pmod(xxhash64(col("url").cast("string")),
        lit(graft.ops.SamplingOps.CapSalt)).as("sh"))
      .filter(col("sh").isNotNull).distinct().count()
    assert(shards > 1, "string ids landed in a single salt shard")
  }

  test("Similarity.kmeans matches the table-bound query under renamed columns") {
    val api = Similarity.kmeans(emb, col("eid"), col("e"))
    assert(rows(api) === rows(SimilarityOps.embKmeans(spark, dir)))
  }

  test("Similarity.knnClassify matches the table-bound query under renamed columns") {
    val q = emb.filter(col("eid") < SimilarityOps.KnnQueries)
    val c = emb.filter(col("eid") >= SimilarityOps.KnnQueries)
    val api = Similarity.knnClassify(c, col("eid"), col("e"), col("label"),
      q, col("eid"), col("e"), SimilarityOps.KnnK)
    assert(rows(api) === rows(SimilarityOps.knnClassify(spark, dir)))
  }
}
