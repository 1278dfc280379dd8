package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Hashing._
import graft.ops.TextOps.{tokens, TokensSql}

/** Deduplication operators over `documents` -- exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine (SURVEY.md S7.6; the
  * training-data-pipeline surface).
  *
  * Scale design (the point is 100 TB, not 500 rows):
  *  - Exact dedup is one hash-partitioned groupBy on a 60-bit content
  *    key -- the classic map-side-combinable exact pass.
  *  - MinHash signatures and band hashes are narrow per-row
  *    expressions; the quadratic step only happens WITHIN an LSH band
  *    bucket (equi-join on (band_idx, band_hash) -- a shuffle-hash
  *    join on a high-cardinality key, never a cross join).
  *  - SimHash reduces each doc to one 32-bit fingerprint, then blocks
  *    pairwise comparison by `lang` (swap in band-prefix blocking for
  *    wider corpora).
  *  - n-gram Jaccard blocks by (lang, source) -- the "compare within
  *    natural partitions" pattern.
  *  - Embedding near-dup brute force is the correctness baseline; the
  *    scale path is sign-LSH bucketing in [[SimilarityOps]].
  */
object DedupOps {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on canonical token-set content: groups whose sorted
    * distinct token set hashes equal are duplicates; min doc_id
    * survives. Output one row per distinct content key. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val key = md5(array_join(array_sort(array_distinct(tokens(col("text")))), " "))
    Tables.documents(s, dir)
      .select(col("doc_id"), key.as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("survivor_id"),
        count(lit(1)).as("n_docs"))
  }

  val dedupExactSql: String =
    s"""SELECT md5(array_to_string(list_sort(list_distinct($TokensSql)), ' ')) AS content_key,
       min(doc_id) AS survivor_id, count(*) AS n_docs
       FROM documents GROUP BY 1"""

  // ---------------------------------------------------------- minhash+LSH

  val MinhashK = 16
  val LshBandCount = 2
  val LshRows = 8
  val JaccardThreshold = 0.9

  /** True Jaccard over distinct token sets (verification step). */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash + LSH near-duplicate pairs: signature -> band buckets ->
    * equi-join candidates -> exact-Jaccard verification >= 0.9.
    * Returns (doc_a, doc_b, jaccard). Candidate recall is governed by
    * the (bands, rows) curve: P(candidate) = 1-(1-j^rows)^bands. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val sig = docs.select(col("doc_id"), col("toks"),
      lshBands(minhashSig(col("toks"), MinhashK), LshBandCount, LshRows).as("bands"))
    val buckets = sig.select(col("doc_id"), col("toks"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = buckets.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = buckets.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("toks_a"), col("toks_b")), 4).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= JaccardThreshold)
  }

  val dedupMinhashLshSql: String = {
    val sig = minhashSigSql("toks", MinhashK)
    val bands = lshBandsSql("sig", LshBandCount, LshRows)
    s"""WITH d AS (
         SELECT doc_id, list_distinct($TokensSql) AS toks FROM documents),
       sigs AS (SELECT doc_id, toks, $sig AS sig FROM d),
       bands AS (SELECT doc_id, toks, $bands AS bands FROM sigs),
       buckets AS (
         SELECT doc_id, toks, i - 1 AS band_idx, bands[i] AS band_hash
         FROM bands, generate_series(1, ${LshBandCount}) gs(i)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
         FROM buckets a JOIN buckets b
           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, jaccard FROM cand WHERE jaccard >= $JaccardThreshold"""
  }

  // -------------------------------------------------------------- simhash

  val SimhashBits = 32
  val HammingThreshold = 4

  /** 32-bit SimHash fingerprint per doc, computed distributed:
    * explode distinct tokens, weight each hash bit +1/-1, sum per
    * (doc, bit), reassemble the fingerprint. Two aggregations, both
    * map-side combinable. */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val bits = docs
      .select(col("doc_id"), col("lang"), h15(col("tok")).as("th"),
        explode(sequence(lit(0), lit(SimhashBits - 1))).as("bit"))
      .groupBy(col("doc_id"), col("lang"), col("bit"))
      .agg(sum(when(expr("shiftright(th, CAST(bit AS INT)) & 1") === 1, 1)
        .otherwise(-1)).as("weight"))
    bits.groupBy(col("doc_id"), col("lang"))
      .agg(sum(when(col("weight") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance <= 4 within `lang`
    * blocks. bit_count(a XOR b) over one long per doc -- the pairwise
    * step touches 8 bytes per doc, not the token sets. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val fp = simhashFingerprints(s, dir)
    val a = fp.select(col("lang"), col("doc_id").as("doc_a"), col("simhash").as("fp_a"))
    val b = fp.select(col("lang"), col("doc_id").as("doc_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= HammingThreshold)
  }

  val dedupSimhashSql: String =
    s"""WITH toks AS (
         SELECT doc_id, lang, unnest(list_distinct($TokensSql)) AS tok
         FROM documents),
       bits AS (
         SELECT doc_id, lang, bit,
           sum(CASE WHEN (${h15Sql("tok")} >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
         FROM toks, generate_series(0, ${SimhashBits - 1}) gs(bit)
         GROUP BY 1, 2, 3),
       fp AS (
         SELECT doc_id, lang,
           sum(CASE WHEN weight > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
         FROM bits GROUP BY 1, 2)
       SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold"""

  // -------------------------------------------------------- n-gram jaccard

  val NgramN = 3
  val NgramThreshold = 0.02

  /** Word n-gram (shingle) arrays. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(transform(sequence(lit(1), greatest(size(t) - lit(n - 1), lit(1))),
      i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** n-gram Jaccard near-dup pairs, blocked by (lang, source) --
    * pairwise only within natural partitions. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("lang"), col("source"),
      col("doc_id"), shingles(col("text"), NgramN).as("sh"))
    val a = docs.select(col("lang"), col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("lang"), col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("ngram_jaccard"))
      .filter(col("ngram_jaccard") >= NgramThreshold)
  }

  val dedupNgramJaccardSql: String = {
    val sh = s"list_distinct(list_transform(" +
      s"generate_series(1, greatest(len($TokensSql) - ${NgramN - 1}, 1)), " +
      s"i -> array_to_string(($TokensSql)[i:i+${NgramN - 1}], ' ')))"
    s"""WITH d AS (
         SELECT lang, source, doc_id, $sh AS sh FROM documents)
       SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS ngram_jaccard
       FROM d a JOIN d b
         ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
       WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= $NgramThreshold"""
  }

  // --------------------------------------------------- embedding near-dup

  val CosineThreshold = 0.4

  /** Embedding-cosine near-dup pairs over `embeddings`, brute-force
    * within `label` blocks (correctness baseline; [[SimilarityOps]]
    * carries the sign-LSH scale path). Dot products fold
    * left-to-right in double -- bit-identical to the oracle. */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("label"), col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val withNorm = e.select(col("label"), col("vec_id"), col("v"),
      sqrt(SimilarityOps.dot(col("v"), col("v"))).as("nrm"))
    val a = withNorm.select(col("label"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("label"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(SimilarityOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= CosineThreshold)
  }

  val dedupEmbedCosineSql: String =
    s"""WITH e AS (
         SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
         FROM embeddings),
       n AS (SELECT label, vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
       SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
       FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
       WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= $CosineThreshold"""
}
