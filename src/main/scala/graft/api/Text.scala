package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Hashing, TextOps}

/** DataFrame-first text-analysis API over arbitrary id/text columns
  * (the `graft.ops` query functions bind the same operators to the
  * test tables for the oracle gates). All operators are single-pass
  * narrow projections or one-shuffle aggregations.
  */
object Text {

  /** Whitespace tokens of a text column. */
  def tokenize(text: Column): Column = TextOps.tokens(text)

  /** Unicode-normalized tokens: NFKC + lowercase (native codegen'd
    * pass), single-char CJK segmentation, punctuation-aware
    * letter/digit-run splitting. */
  def tokenizeNormalized(text: Column): Column = TextOps.normTokens(text)

  /** Opt-in normalization ADAPTER: pass `normalize(text)` anywhere an
    * operator takes its text column and that operator runs on
    * normalized tokens -- `Dedup.minhashPairs(docs, id,
    * Text.normalize(text))` catches near-dups that differ only in
    * case, punctuation, or Unicode form, which the raw tokenizer
    * misses. */
  def normalize(text: Column): Column = TextOps.normalizeText(text)

  /** Learn BPE merge rules from a corpus (word-frequency table = the
    * one corpus-sized aggregate; the merge loop is vocab-sized).
    * Deterministic: freq-desc / pair-asc argmax per round. */
  def bpeTrain(docs: DataFrame, text: Column,
      merges: Int = TextOps.BpeMerges): Seq[(String, String)] =
    TextOps.bpeTrain(docs.select(text.as("text")), merges)

  /** Encode a corpus with learned BPE rules (applied in rank order --
    * classic greedy left-to-right merging): per-doc normalized-token
    * and subword-piece counts. */
  def bpeEncode(docs: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame =
    TextOps.bpeEncodeOf(docs.select(id.as("doc_id"), text.as("text")), merges)

  /** Token counting + cheap quality signals: token/char counts,
    * lexical diversity, mean token length, stopword ratio, BPE-ish
    * subword count. One narrow projection pass. */
  def stats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val t = TextOps.tokens(text)
    val n = size(t)
    val sumLen = aggregate(transform(t, x => length(x)), lit(0L), (a, x) => a + x)
    docs.select(
      id.as("doc_id"),
      n.cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      length(text).cast("long").as("n_chars"),
      round(size(array_distinct(t)).cast("double") / n, 4).as("lexical_diversity"),
      round(sumLen.cast("double") / n, 4).as("avg_token_len"),
      size(regexp_extract_all(text, lit(TextOps.BpeishPattern), lit(0)))
        .cast("long").as("n_bpeish_tokens"))
  }

  /** Marker-based language ID: per-language marker counts and a
    * deterministic argmax ('und' on ties / all-zero). */
  def langId(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val t = TextOps.tokens(text)
    val scores = TextOps.LangMarkers.map { case (l, ms) =>
      l -> size(filter(t, tok => tok.isInCollection(ms)))
    }
    val pred = scores.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      val others = scores.filter(_._1 != l).map(_._2)
      when(others.foldLeft(sc > 0)((c, o) => c && sc > o), l).otherwise(acc)
    }
    docs.select(
      (id.as("doc_id") +: scores.map { case (l, sc) => sc.cast("long").as(s"score_$l") }) :+
        pred.as("predicted_lang"): _*)
  }

  /** Whole-document md5 + winnowing-style rolling min-hash
    * fingerprint (robust to local edits). */
  def fingerprints(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val t = TextOps.tokens(text)
    val n = size(t)
    val windows = transform(sequence(lit(1), n - lit(7)),
      i => Hashing.h15(array_join(slice(t, i, lit(8)), " ")))
    docs.select(
      id.as("doc_id"),
      md5(text).as("md5_full"),
      when(n < 8, Hashing.h15(text)).otherwise(array_min(windows)).as("winnow_fp"))
  }

  /** TF-IDF per (doc, token): tf * ln(N/df); corpus size rides in as
    * a broadcast 1-row aggregate. */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("__text"))
    val n = base.agg(count(lit(1)).cast("double").as("n_docs"))
    val termFreq = base
      .select(col("doc_id"), explode(TextOps.tokens(col("__text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = termFreq.groupBy(col("token")).agg(count(lit(1)).as("df"))
    termFreq.join(docFreq, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf"))
  }

  /** Okapi BM25 per (doc, token): the lexical-retrieval ranking
    * function. Doc length rides through the tf groupBy key (no extra
    * join); corpus stats broadcast as one row. */
  def bm25(docs: DataFrame, id: Column, text: Column): DataFrame =
    graft.queries.AnalyticsQueries.bm25(
      docs.select(id.as("doc_id"), text.as("text")))

  /** Gopher-style repetition metrics: top-token frequency/fraction,
    * duplicate 2-/3-gram fractions. One narrow projection pass. */
  def repetition(docs: DataFrame, id: Column, text: Column): DataFrame =
    TextOps.repetitionOf(docs.select(id.as("doc_id"), text.as("text")))

  /** PII scrub: email/IPv4 match counts + the redacted text (typed
    * placeholder tags). One narrow regex projection pass. */
  def piiScrub(docs: DataFrame, id: Column, text: Column): DataFrame =
    TextOps.piiScrubOf(docs.select(id.as("doc_id"), text.as("text")))

  /** Corpus vocabulary top-k by frequency (deterministic tiebreak). */
  def vocabTopK(docs: DataFrame, text: Column, k: Int = 20): DataFrame =
    docs.select(explode(TextOps.tokens(text)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Fixed context-window chunking: every token lands in exactly one
    * chunk, last chunk keeps the remainder. Shuffle-free
    * projection+explode. */
  def chunk(docs: DataFrame, id: Column, text: Column,
            chunkTokens: Int = TextOps.ChunkTokens): DataFrame =
    TextOps.chunkOf(docs.select(id.as("doc_id"), text.as("text")), chunkTokens)

  /** Content-defined chunking: rolling-hash boundaries (edit-stable
    * -- an insert/delete re-chunks only its neighborhood, so
    * chunk-level dedup survives document versioning) with a length
    * cap. See [[TextOps.cdcChunkOf]] for the scale shape. */
  def cdcChunk(docs: DataFrame, id: Column, text: Column,
      window: Int = TextOps.CdcWindow, divisor: Int = TextOps.CdcDivisor,
      maxTokens: Int = TextOps.CdcMaxTokens): DataFrame =
    TextOps.cdcChunkOf(docs.select(id.as("doc_id"), text.as("text")),
      window, divisor, maxTokens)

  /** Concat-and-chunk packing offsets per stream: which training bin
    * each doc starts/ends in and whether it straddles a boundary.
    * `stream` bounds the window partitions -- at scale pass a
    * (lang, shard) composite so no stream holds a whole language. */
  def pack(docs: DataFrame, id: Column, text: Column, stream: Column,
           budgetTokens: Long = TextOps.PackBudget): DataFrame =
    TextOps.packOf(
      docs.select(id.as("doc_id"), text.as("text"), stream.as("lang")),
      budgetTokens)

  /** Corpus-unigram LM score (CCNet-style quality signal): per doc,
    * the average ln p(token) under the corpus unigram distribution. */
  def unigramLogprob(docs: DataFrame, id: Column, text: Column): DataFrame =
    TextOps.unigramLogprobOf(docs.select(id.as("doc_id"), text.as("text")))

  /** Corpus-bigram LM score with unigram-interpolated backoff --
    * sensitive to unusual word ORDER, not just unusual words. Docs
    * with fewer than two tokens drop (no bigrams). */
  def bigramLogprob(docs: DataFrame, id: Column, text: Column): DataFrame =
    TextOps.bigramLogprobOf(docs.select(id.as("doc_id"), text.as("text")))

  /** Char-distribution Shannon entropy (nats) -- the gibberish /
    * base64-blob / single-char-spam band filter. Within-row, no
    * shuffle. */
  def charEntropy(docs: DataFrame, id: Column, text: Column): DataFrame =
    TextOps.charEntropyOf(docs.select(id.as("doc_id"), text.as("text")))

  /** Multinomial Naive Bayes: fit on `labeled`, score `unlabeled` --
    * the fastText-quality-filter / learned-lang-id shape, hash-exact
    * by integer counts + quantized log terms. Returns (doc_id,
    * pred_label, score). */
  def nbClassify(labeled: DataFrame, lid: Column, ltext: Column,
      label: Column, unlabeled: DataFrame, uid: Column,
      utext: Column): DataFrame =
    TextOps.nbClassifyOf(
      labeled.select(lid.as("doc_id"), ltext.as("text"), label.as("label")),
      unlabeled.select(uid.as("doc_id"), utext.as("text")))
}
