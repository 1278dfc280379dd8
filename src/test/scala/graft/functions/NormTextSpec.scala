package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.TextOps

/** Pinned semantics of the Unicode normalization layer -- including
  * the NFKC cases the DuckDB oracle cannot reproduce (no NFKC there),
  * and the planted near-dup pair that MinHash catches only with
  * normalization on. */
class NormTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextOps.normTokens(col("text")).as("t"))
      .as[Seq[String]].collect().head

  test("ASCII case + punctuation folding") {
    assert(norm("Hello, World!") === Seq("hello", "world"))
    assert(norm("Don't  stop -- ever.") === Seq("don", "t", "stop", "ever"))
    assert(norm("a1 B2-c3") === Seq("a1", "b2", "c3"))
  }

  test("NFKC compatibility folding: fullwidth + ligature (Spark-side pinned)") {
    // DuckDB has no NFKC; these cases are pinned HERE instead of in
    // the oracle (TextOps.normTokensSqlOn documents the caveat)
    assert(norm("Ｆｕｌｌ width") === Seq("full", "width"))
    assert(norm("the ﬁnal ﬂight") === Seq("the", "final", "flight"))
  }

  test("CJK ideographs and kana segment to single-char tokens") {
    assert(norm("我爱Spark") === Seq("我", "爱", "spark"))
    assert(norm("カタカナtest") ===
      Seq("カ", "タ", "カ", "ナ", "test"))
  }

  test("degenerate inputs: empty, punctuation-only, null") {
    assert(norm("") === Seq.empty)
    assert(norm("!!! ... ???") === Seq.empty)
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(TextOps.normTokens(col("text")).as("t")).collect().head
    assert(r.isNullAt(0))
  }

  test("non-BMP input survives the codepoint walk") {
    // emoji are neither letters nor digits -> stripped as punctuation;
    // the surrogate pair must not split or corrupt neighboring tokens
    assert(norm("good 😀 day") === Seq("good", "day"))
  }

  test("normalizeText adapter matches DuckDB twin on the real corpus") {
    // the oracle gate runs this cross-engine at sf0.01; here pin that
    // the adapter's space-join round-trips through the raw tokenizer
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val roundTrip = docs.select(
      TextOps.normTokens(col("text")).as("direct"),
      TextOps.tokens(TextOps.normalizeText(col("text"))).as("rejoined"))
      .filter(size(col("direct")) > 0)
      .filter(not(col("direct") === col("rejoined")))
    assert(roundTrip.count() === 0L)
  }

  test("planted case/punct near-dup pair: MinHash catches it ONLY normalized") {
    // two renderings of the same sentence, padded with shared filler
    // so the token sets are large enough for banded LSH to collide
    val filler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val a = s"The Quick, Brown Fox -- JUMPS over the Lazy Dog! $filler"
    val b = s"the quick brown fox jumps over the lazy dog ${filler.toUpperCase}"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val raw = graft.api.Dedup.minhashPairs(docs, col("doc_id"), col("text"))
    val normed = graft.api.Dedup.minhashPairs(docs, col("doc_id"),
      graft.api.Text.normalize(col("text")))
    assert(raw.count() === 0L,
      "raw tokenizer should MISS the case/punct variant pair")
    assert(normed.count() === 1L,
      "normalized tokenizer should catch the variant pair at jaccard 1.0")
    val j = normed.select(col("jaccard")).as[Double].collect().head
    assert(j === 1.0)
  }
}
