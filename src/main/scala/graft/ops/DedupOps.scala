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
  *  - SimHash reduces each doc to one 31-bit fingerprint; pairs come
  *    from hamming-LSH banding (threshold+1 exact bit-bands -- 100%
  *    recall by pigeonhole), never an all-pairs join within a block.
  *  - n-gram Jaccard reuses the MinHash-LSH banding over hashed
  *    shingle sets; the merge-walk Jaccard verifies inside the join.
  *  - Embedding near-dup brute force is the correctness baseline; the
  *    scale paths are sign-LSH and IVF in [[SimilarityOps]].
  *
  * The DataFrame-first library surface (arbitrary id/text columns)
  * is [[graft.api.Dedup]]; these functions bind the same operators to
  * the driver's test tables for the DuckDB oracle gates.
  */
object DedupOps {

  // ---------------------------------------------------------------- exact

  /** Canonical content key: md5 of the sorted distinct token set --
    * the exact-dedup identity shared by the batch, API, and streaming
    * paths. */
  def contentKey(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Exact dedup on canonical token-set content: groups whose sorted
    * distinct token set hashes equal are duplicates; min doc_id
    * survives. Output one row per distinct content key. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), contentKey(col("text")).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("survivor_id"),
        count(lit(1)).as("n_docs"))
  }

  val dedupExactSql: String =
    s"""SELECT md5(array_to_string(list_sort(list_distinct($TokensSql)), ' ')) AS content_key,
       min(doc_id) AS survivor_id, count(*) AS n_docs
       FROM documents GROUP BY 1"""

  // ---------------------------------------------------- paragraph dedup

  /** Block width (tokens) for the oracle entry's segmentation -- the
    * driver's synthetic corpus has no newline structure, so the gate
    * segments into fixed-width token blocks; production corpora pass
    * a newline/regex segmenter through [[graft.api.Dedup.paragraphDedup]]. */
  val ParaBlockTokens = 20

  /** Corpus-wide duplicate-paragraph removal -- the CCNet/C4
    * line-level dedup step: every paragraph is content-hashed, the
    * FIRST occurrence corpus-wide (smallest (doc_id, idx)) survives,
    * every later occurrence (including repeats inside one document)
    * is cut, and each document is reassembled from its surviving
    * paragraphs in original order. Removes boilerplate (headers,
    * navigation, license blocks) that exact whole-doc dedup cannot
    * see and MinHash only blurs into lowered similarity.
    *
    * Input: a (doc_id, idx, para) paragraph stream (see
    * [[paragraphsOf]] / the fixed-width [[paraBlocksOf]]). Output one
    * row per document: (doc_id, n_paras, n_kept, text_dedup).
    *
    * Scale shape: the stream is narrow (id, int, paragraph text);
    * first-occurrence election is a map-side-combinable min-struct
    * aggregate keyed on the paragraph hash (ONE shuffle on pk, no
    * window over the corpus); the keep-filter join reuses the same pk
    * partitioning; reassembly is the one doc-keyed shuffle. Nothing
    * is ever pairwise -- cost is O(paragraphs), the same discipline
    * as exact dedup. At 100 TB pk is the natural hash-partition key
    * and the hottest key's bucket is one paragraph-group, not a
    * skew hazard (groups collapse in the map-side combine). */
  def paragraphDedupOf(paras: DataFrame, joinSep: String = " "): DataFrame = {
    val keyed = paras.select(col("doc_id"), col("idx"), col("para"),
      md5(col("para")).as("pk"))
    val first = keyed.groupBy(col("pk"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
    keyed.join(first, Seq("pk"))
      .withColumn("kept",
        col("doc_id") === col("f.doc_id") && col("idx") === col("f.idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(col("kept").cast("long")).as("n_kept"),
        concat_ws(joinSep, transform(
          filter(
            sort_array(collect_list(struct(col("idx"),
              when(col("kept"), col("para")).as("para")))),
            p => p.getField("para").isNotNull),
          p => p.getField("para"))).as("text_dedup"))
  }

  /** Regex-segmented (doc_id, idx, para) paragraph stream: the
    * production segmentation (split on blank lines / newlines), empty
    * segments dropped with original positions kept. */
  def paragraphsOf(docs: DataFrame, id: Column, text: Column,
      splitRegex: String = "\\n+"): DataFrame =
    docs.select(id.as("doc_id"),
        posexplode(split(text, splitRegex)).as(Seq("idx", "para")))
      .filter(length(trim(col("para"))) > 0)

  /** Fixed-width token-block segmentation -- the oracle-gate
    * paragraph definition for the newline-free synthetic corpus. */
  def paraBlocksOf(docs: DataFrame, id: Column, text: Column,
      width: Int = ParaBlockTokens): DataFrame =
    docs.select(id.as("doc_id"), tokens(text).as("tk"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ceil(size(col("tk")) / lit(width.toDouble)).cast("int") - 1),
          i => concat_ws(" ", slice(col("tk"), i * width + 1, lit(width)))))
          .as(Seq("idx", "para")))

  def dedupParagraph(s: SparkSession, dir: String): DataFrame =
    paragraphDedupOf(paraBlocksOf(Tables.documents(s, dir),
      col("doc_id"), col("text")))

  val dedupParagraphSql: String = {
    val w = ParaBlockTokens
    s"""WITH tk AS (SELECT doc_id, $TokensSql AS tk FROM documents),
       seg0 AS (SELECT doc_id,
           unnest(list_transform(
             generate_series(0, CAST(ceil(len(tk) / $w.0) AS INT) - 1),
             i -> {'idx': CAST(i AS INT),
                   'para': array_to_string(
                     tk[i*$w+1 : least((i+1)*$w, len(tk))], ' ')})) AS s
         FROM tk),
       seg AS (SELECT doc_id, s.idx AS idx, s.para AS para FROM seg0),
       k AS (SELECT doc_id, idx, para,
           (row_number() OVER (PARTITION BY md5(para)
              ORDER BY doc_id, idx) = 1) AS kept FROM seg)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         coalesce(array_to_string(array_agg(para ORDER BY idx)
           FILTER (WHERE kept), ' '), '') AS text_dedup
       FROM k GROUP BY 1"""
  }

  // ---------------------------------------------------------- minhash+LSH

  val MinhashK = 16
  val LshBandCount = 2
  val LshRows = 8
  val JaccardThreshold = 0.9
  /** Salt fan-out for the skewed bucket self-join. */
  val SaltGroups = 8
  /** Pinned shuffle width for pair-blowup joins (AQE would coalesce
    * them to ~1 partition based on their tiny input size). */
  val JoinParallelism = 64

  /** Sorted distinct 31-bit token-hash set -- the compact (8 bytes/
    * token) representation every similarity pass runs on. Hashing
    * first means pair verification compares primitive longs via a
    * codegen'd merge walk, not string sets in interpreted HOFs. */
  def hashedTokenSet(text: Column): Column =
    graft.functions.HashExprs.md5ShingleSet(tokens(text), 1)

  val HashedTokensSql: String =
    s"list_sort(list_distinct(list_transform($TokensSql, t -> ${h31Sql("t")})))"

  /** Generic salted MinHash-LSH near-duplicate pair generation over a
    * `(doc_id, th)` input (th = sorted distinct 31-bit element
    * hashes): signature -> band buckets -> equi-join candidates ->
    * exact-Jaccard verification >= `threshold` via the codegen'd
    * merge walk. Returns (doc_a, doc_b, scoreName).
    * Candidate recall follows the banding curve
    * P(candidate) = 1-(1-j^rows)^bands.
    *
    * Shuffle discipline: the bucket join shuffles one compact row per
    * (doc, band) -- the candidate-pair blowup happens inside the join
    * stage and is consumed inline (merge-walk Jaccard + filter), never
    * re-shuffled. Pair uniqueness comes from the first-colliding-band
    * rule (emit at band b only if no earlier band also collided)
    * instead of a multi-million-row DISTINCT. */
  private[graft] def lshJaccardPairs(items: DataFrame, k: Int, bandCount: Int,
      rows: Int, threshold: Double, scoreName: String): DataFrame = {
    // materialize the hash-heavy projection ONCE: both self-join
    // branches read it, and without this each branch recomputes the
    // element hashing + K-permutation signature from the raw scan
    // (the single most expensive stage of the whole operator)
    val docs = materializeOnce(items
      .withColumn("bands", lshBands(
        graft.functions.HashExprs.minhashSig(col("th"), k), bandCount, rows)))
    // posexplode_outer, deliberately: plain posexplode triggers
    // InferFiltersFromGenerate, whose `size(bands) > 0` filter gets
    // pushed through the projections to the scan WITH the whole
    // 16-permutation signature expression inlined -- recomputing the
    // signatures serially at the (1-file) scan. bands is always
    // length-bandCount (never empty), so outer-explode is
    // semantically identical.
    val buckets = docs.select(col("doc_id"), col("th"), col("bands"),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
    // Salted self-join: near-dup corpora put thousands of docs in one
    // band bucket, so the bucket id alone is a skewed join key (two
    // buckets can hold >90% of all pairs). Salt each side G ways by
    // doc_id so a bucket's pair space splits into G^2 independently
    // joined cells; every (a,b) pair still matches exactly once, on
    // key (band, g(a), g(b)). The emitted pair SET is unchanged.
    // The salt group is pmod(xxhash64(id), G), NOT id % G: the API
    // surface admits arbitrary id types, and a string id under `% G`
    // coerces to null (numeric ids can also go negative), which
    // would silently empty the join instead of failing.
    val G = SaltGroups
    val saltOf: Column => Column = id => pmod(xxhash64(id), lit(G)).cast("int")
    val a = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_a"), col("th").as("th_a"), col("bands").as("bands_a"))
      .withColumn("ga", saltOf(col("doc_a")))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val b = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_b"), col("th").as("th_b"), col("bands").as("bands_b"))
      .withColumn("gb", saltOf(col("doc_b")))
      .withColumn("ga", explode(sequence(lit(0), lit(G - 1))))
    val firstCollidingBand = (0 until bandCount).map { i =>
      col("band_idx") <= i || element_at(col("bands_a"), i + 1) =!= element_at(col("bands_b"), i + 1)
    }.reduce(_ && _)
    val jaccard =
      round(graft.functions.ArrayExprs.sortedLongJaccard(col("th_a"), col("th_b")), 4)
    // Two deliberate choices:
    //  - explicit co-partitioning with a PINNED width: the join INPUT
    //    is tiny (AQE would coalesce it to ~1 partition) but the
    //    OUTPUT is the pair blowup, which must run wide;
    //  - the ENTIRE verification predicate lives in the join
    //    condition, so the millions of non-qualifying candidate pairs
    //    are rejected inside the join loop and never materialize
    //    output rows (the arrays never leave the probe).
    val bR = b.withColumnsRenamed(Map("band_idx" -> "bi_b", "band_hash" -> "bh_b",
      "ga" -> "ga_b", "gb" -> "gb_b"))
    val cond = col("band_idx") === col("bi_b") && col("band_hash") === col("bh_b") &&
      col("ga") === col("ga_b") && col("gb") === col("gb_b") &&
      col("doc_a") < col("doc_b") && firstCollidingBand && jaccard >= threshold
    a.repartition(JoinParallelism, col("band_idx"), col("band_hash"), col("ga"), col("gb"))
      .join(bR.repartition(JoinParallelism, col("bi_b"), col("bh_b"), col("ga_b"), col("gb_b")),
        cond)
      .select(col("doc_a"), col("doc_b"), jaccard.as(scoreName))
  }

  /** DuckDB twin of [[lshJaccardPairs]]: identical banding over the
    * same element-set SQL, so both engines derive the same candidate
    * set and the same verified pairs. */
  private[graft] def lshJaccardPairsSql(setSql: String, k: Int, bandCount: Int,
      rows: Int, threshold: Double, scoreName: String,
      from: String = "documents"): String = {
    val sig = minhashSigSql("th", k)
    val bands = lshBandsSql("sig", bandCount, rows)
    s"""WITH d AS (
         SELECT doc_id, $setSql AS th FROM $from),
       sigs AS (SELECT doc_id, th, $sig AS sig FROM d),
       bands AS (SELECT doc_id, $bands AS bands FROM sigs),
       buckets AS (
         SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
         FROM bands, generate_series(1, ${bandCount}) gs(i)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM buckets a JOIN buckets b
           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(da.th, db.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db.th))), 4) AS $scoreName
       FROM cand JOIN d da ON cand.doc_a = da.doc_id
                 JOIN d db ON cand.doc_b = db.doc_id
       WHERE round(CAST(len(list_intersect(da.th, db.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db.th))), 4) >= $threshold"""
  }

  /** Cross-corpus variant of [[lshJaccardPairs]] for INCREMENTAL
    * dedup: the NEW batch's band buckets join against the EXISTING
    * corpus's -- never new x new or base x base -- so a continuous-
    * ingest pipeline dedups an arriving batch against a 100 TB corpus
    * at cost proportional to the BATCH's bucket collisions, not the
    * corpus pair space (and the base side's signatures can come
    * precomputed from the corpus table: inputs are (doc_id, th)).
    * Same banding curve, salt discipline, and inside-the-join
    * merge-walk verification as the self-join path; per-pair single
    * emission by the first-colliding-band rule. Returns
    * (new_id, existing_id, scoreName). */
  private[graft] def lshJaccardPairsBetween(newItems: DataFrame,
      baseItems: DataFrame, k: Int, bandCount: Int, rows: Int,
      threshold: Double, scoreName: String): DataFrame = {
    def buckets(items: DataFrame): DataFrame =
      materializeOnce(items.withColumn("bands", lshBands(
          graft.functions.HashExprs.minhashSig(col("th"), k), bandCount, rows)))
        .select(col("doc_id"), col("th"), col("bands"),
          posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
    val G = SaltGroups
    val saltOf: Column => Column = id => pmod(xxhash64(id), lit(G)).cast("int")
    val a = buckets(newItems).select(col("band_idx"), col("band_hash"),
        col("doc_id").as("new_id"), col("th").as("th_a"), col("bands").as("bands_a"))
      .withColumn("ga", saltOf(col("new_id")))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val b = buckets(baseItems).select(col("band_idx").as("bi_b"), col("band_hash").as("bh_b"),
        col("doc_id").as("existing_id"), col("th").as("th_b"), col("bands").as("bands_b"))
      .withColumn("gb_b", saltOf(col("existing_id")))
      .withColumn("ga_b", explode(sequence(lit(0), lit(G - 1))))
    val firstCollidingBand = (0 until bandCount).map { i =>
      col("band_idx") <= i || element_at(col("bands_a"), i + 1) =!= element_at(col("bands_b"), i + 1)
    }.reduce(_ && _)
    val jaccard =
      round(graft.functions.ArrayExprs.sortedLongJaccard(col("th_a"), col("th_b")), 4)
    val cond = col("band_idx") === col("bi_b") && col("band_hash") === col("bh_b") &&
      col("ga") === col("ga_b") && col("gb") === col("gb_b") &&
      firstCollidingBand && jaccard >= threshold
    a.repartition(JoinParallelism, col("band_idx"), col("band_hash"), col("ga"), col("gb"))
      .join(b.repartition(JoinParallelism, col("bi_b"), col("bh_b"), col("ga_b"), col("gb_b")),
        cond)
      .select(col("new_id"), col("existing_id"), jaccard.as(scoreName))
  }

  /** Incremental dedup over `documents`: odd doc_ids play the
    * arriving batch, even doc_ids the existing corpus -- (new_id,
    * existing_id, jaccard) at the standard 0.9 threshold.
    *
    * Both sides here derive from ONE table, so the token-hash
    * projection is materialized once and each side filters it --
    * without this the md5 hashing (the expensive stage) runs twice.
    * A real deployment feeds two different tables and skips this. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = materializeOnce(Tables.documents(s, dir)
      .repartition(JoinParallelism)
      .select(col("doc_id"), hashedTokenSet(col("text")).as("th")))
    lshJaccardPairsBetween(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      MinhashK, LshBandCount, LshRows, JaccardThreshold, "jaccard")
  }

  val dedupIncrementalSql: String = {
    val sig = minhashSigSql("th", MinhashK)
    val bands = lshBandsSql("sig", LshBandCount, LshRows)
    s"""WITH dn AS (
         SELECT doc_id, $HashedTokensSql AS th FROM documents WHERE doc_id % 2 = 1),
       dbs AS (
         SELECT doc_id, $HashedTokensSql AS th FROM documents WHERE doc_id % 2 = 0),
       bn AS (SELECT doc_id, $bands AS bands
              FROM (SELECT doc_id, th, $sig AS sig FROM dn)),
       bb AS (SELECT doc_id, $bands AS bands
              FROM (SELECT doc_id, th, $sig AS sig FROM dbs)),
       un AS (SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
              FROM bn, generate_series(1, $LshBandCount) gs(i)),
       ub AS (SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
              FROM bb, generate_series(1, $LshBandCount) gs(i)),
       cand AS (
         SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS existing_id
         FROM un a JOIN ub b
           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash)
       SELECT new_id, existing_id,
         round(CAST(len(list_intersect(da.th, db2.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db2.th))), 4) AS jaccard
       FROM cand JOIN dn da ON cand.new_id = da.doc_id
                 JOIN dbs db2 ON cand.existing_id = db2.doc_id
       WHERE round(CAST(len(list_intersect(da.th, db2.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db2.th))), 4) >= $JaccardThreshold"""
  }

  /** MinHash + LSH near-dup pairs over the hashed TOKEN sets,
    * verified at jaccard >= 0.9 -- (doc_a, doc_b, jaccard). */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // repartition BEFORE the hash-heavy projection: the raw scan is
    // often one small file = one task; the signature computation must
    // run wide (and is recomputed per join branch)
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), hashedTokenSet(col("text")).as("th"))
    lshJaccardPairs(docs, MinhashK, LshBandCount, LshRows, JaccardThreshold, "jaccard")
  }

  val dedupMinhashLshSql: String =
    lshJaccardPairsSql(HashedTokensSql, MinhashK, LshBandCount, LshRows,
      JaccardThreshold, "jaccard")

  /** MinHash-LSH over the NORMALIZED tokenizer -- the hash-gated
    * proof of the normalization adapter composition ([[graft.api.Text.normalize]]
    * riding through the existing text parameter): near-dup pairs that
    * differ only in case/punctuation now collide. The DuckDB twin
    * round-trips through array_to_string/string_split exactly as the
    * adapter does, so the empty-normalization edge (pure-punctuation
    * doc -> one empty token) matches bit-for-bit too. */
  def dedupMinhashNorm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"),
        hashedTokenSet(TextOps.normalizeText(col("text"))).as("th"))
    lshJaccardPairs(docs, MinhashK, LshBandCount, LshRows,
      JaccardThreshold, "jaccard")
  }

  val dedupMinhashNormSql: String = {
    val normTokens =
      s"string_split(${TextOps.normalizeTextSqlOn("text")}, ' ')"
    val set =
      s"list_sort(list_distinct(list_transform($normTokens, t -> ${h31Sql("t")})))"
    lshJaccardPairsSql(set, MinhashK, LshBandCount, LshRows,
      JaccardThreshold, "jaccard")
  }

  // -------------------------------------------------------------- simhash

  val SimhashBits = 31
  val HammingThreshold = 4

  /** 31-bit SimHash fingerprint per doc over the 31-bit hashed token
    * set -- one narrow native-expression pass (ArrayExprs.SimHash),
    * no explode, no shuffle. */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), col("lang"),
      graft.functions.ArrayExprs.simhash(hashedTokenSet(col("text")), SimhashBits)
        .as("simhash"))

  /** Hamming-LSH band layout: HammingThreshold+1 exact bit-bands over
    * the 31-bit fingerprint as (offset, width) pairs. By pigeonhole,
    * any pair within hamming <= HammingThreshold has ZERO differing
    * bits in at least one band -- banded blocking has exactly 100%
    * recall, so the pair set is identical to the all-pairs join it
    * replaces. */
  val SimhashBandCount: Int = HammingThreshold + 1
  private[ops] val simhashBandLayout: Seq[(Int, Int)] = {
    val base = SimhashBits / SimhashBandCount
    val rem = SimhashBits % SimhashBandCount
    val widths = Seq.tabulate(SimhashBandCount)(i => base + (if (i < rem) 1 else 0))
    widths.scanLeft(0)(_ + _).init.zip(widths)
  }

  private def simhashBandArray(fp: Column): Column =
    array(simhashBandLayout.map { case (off, w) =>
      shiftright(fp, off).bitwiseAND(lit((1L << w) - 1))
    }: _*)

  private def simhashBandArraySql(fpExpr: String): String =
    simhashBandLayout.map { case (off, w) =>
      s"($fpExpr >> $off) & ${(1L << w) - 1}"
    }.mkString("[", ", ", "]")

  /** Generic SimHash near-dup pair generation over a `(doc_id,
    * simhash, blockCols...)` fingerprint table: hamming distance <=
    * [[HammingThreshold]] within each `blockCols` block. Candidates
    * come from an equi-join on (blockCols, band_idx, band_bits) --
    * never an all-pairs join within a block, whose largest block
    * approaches the whole corpus at scale. bit_count(xor)
    * verification runs inside the join condition; the
    * first-colliding-band rule keeps each pair single-emission
    * without a DISTINCT. */
  private[graft] def simhashPairs(fp0: DataFrame, blockCols: Seq[String]): DataFrame = {
    val fp = fp0.withColumn("bands", simhashBandArray(col("simhash")))
    // posexplode_outer for the same InferFiltersFromGenerate reason as
    // the minhash path (bands is always length SimhashBandCount)
    val buckets = fp.select(blockCols.map(col) ++ Seq(col("doc_id"), col("simhash"),
      col("bands"), posexplode_outer(col("bands")).as(Seq("band_idx", "band_bits"))): _*)
    val a = buckets.select(blockCols.map(col) ++ Seq(col("band_idx"), col("band_bits"),
      col("doc_id").as("doc_a"), col("simhash").as("fp_a"), col("bands").as("bands_a")): _*)
    val b = buckets.select(blockCols.map(c => col(c).as(s"${c}_b")) ++ Seq(
      col("band_idx").as("bi_b"), col("band_bits").as("bb_b"),
      col("doc_id").as("doc_b"), col("simhash").as("fp_b"), col("bands").as("bands_b")): _*)
    val firstCollidingBand = (0 until SimhashBandCount).map { i =>
      col("band_idx") <= i || element_at(col("bands_a"), i + 1) =!= element_at(col("bands_b"), i + 1)
    }.reduce(_ && _)
    val hamming = bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
    // the banded key (block x band_idx x band_bits) is high-cardinality
    // enough that AQE's default shuffle planning suffices; rows are
    // ~24 bytes so no salting/pinning (measured: it costs more here)
    val blockEq = blockCols.map(c => col(c) === col(s"${c}_b"))
    val cond = (blockEq :+ (col("band_idx") === col("bi_b")) :+
      (col("band_bits") === col("bb_b")) :+ (col("doc_a") < col("doc_b")) :+
      firstCollidingBand :+ (hamming <= HammingThreshold)).reduce(_ && _)
    a.join(b, cond)
      .select(blockCols.map(col) ++ Seq(col("doc_a"), col("doc_b"),
        hamming.as("hamming")): _*)
  }

  /** SimHash near-dup pairs over `documents`: hamming <= 4 within
    * `lang`, banded (see [[simhashPairs]]). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(simhashFingerprints(s, dir), Seq("lang"))

  val dedupSimhashSql: String =
    s"""WITH toks AS (
         SELECT doc_id, lang, unnest($HashedTokensSql) AS h
         FROM documents),
       bits AS (
         SELECT doc_id, lang, bit,
           sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
         FROM toks, generate_series(0, ${SimhashBits - 1}) gs(bit)
         GROUP BY 1, 2, 3),
       fp AS (
         SELECT doc_id, lang,
           sum(CASE WHEN weight > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
         FROM bits GROUP BY 1, 2),
       bands AS (
         SELECT doc_id, lang, simhash,
           ${simhashBandArraySql("simhash")} AS bands FROM fp),
       buckets AS (
         SELECT doc_id, lang, simhash, i - 1 AS band_idx, bands[i] AS band_bits
         FROM bands, generate_series(1, $SimhashBandCount) gs(i)),
       cand AS (
         SELECT DISTINCT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM buckets a JOIN buckets b
           ON a.lang = b.lang AND a.band_idx = b.band_idx
          AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id)
       SELECT c.lang, c.doc_a, c.doc_b,
         CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
       FROM cand c JOIN fp fa ON c.doc_a = fa.doc_id
                   JOIN fp fb ON c.doc_b = fb.doc_id
       WHERE bit_count(xor(fa.simhash, fb.simhash)) <= $HammingThreshold"""

  // -------------------------------------------------------- n-gram jaccard

  val NgramN = 3
  val NgramThreshold = 0.8
  /** 4 bands x 4 rows over a 16-long signature: recall 0.99 at
    * jaccard 0.9, candidate rate ~4e-4 at jaccard 0.1 -- matched to
    * the shingle-jaccard threshold above (the corpus is cleanly
    * bimodal: near-dup word sequences sit at >= 0.9, everything else
    * under 0.1). */
  val NgramBandCount = 4
  val NgramLshRows = 4

  /** Sorted distinct 31-bit-hashed word n-gram (shingle) set. 31-bit
    * (not the 60-bit h15) so the affine minhash permutations over the
    * shingles stay inside 64-bit arithmetic in both engines. */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.HashExprs.md5ShingleSet(tokens(text), n)

  def hashedShinglesSql(n: Int): String =
    s"list_sort(list_distinct(list_transform(" +
      s"generate_series(1, greatest(len($TokensSql) - ${n - 1}, 1)), " +
      s"i -> ${h31Sql(s"array_to_string(($TokensSql)[i:i+${n - 1}], ' ')")})))"

  /** n-gram (shingle) Jaccard near-dup pairs -- the standard document
    * dedup: MinHash-LSH banding over the hashed shingle sets for
    * candidate generation (NO all-pairs join anywhere), merge-walk
    * shingle Jaccard >= 0.8 as the verifier inside the join
    * condition. Where [[dedupMinhashLsh]] measures bag-of-words
    * similarity, this one is word-ORDER sensitive: only documents
    * sharing long token runs score high. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), hashedShingles(col("text"), NgramN).as("th"))
    lshJaccardPairs(docs, MinhashK, NgramBandCount, NgramLshRows,
      NgramThreshold, "ngram_jaccard")
  }

  val dedupNgramJaccardSql: String =
    lshJaccardPairsSql(hashedShinglesSql(NgramN), MinhashK, NgramBandCount,
      NgramLshRows, NgramThreshold, "ngram_jaccard")

  // ------------------------------------- exact pairs via prefix filtering

  /** EXACT Jaccard near-dup pairs with 100% recall at the threshold —
    * the AllPairs/PPJoin prefix-filter candidate generator (Bayardo
    * et al., WWW'07), the deterministic alternative to probabilistic
    * MinHash banding. For a doc whose sorted element set has size m,
    * any partner with Jaccard >= t must share at least ceil(t*m)
    * elements, so by pigeonhole the pair shares an element inside the
    * doc's first `m - ceil(t*m) + 1` elements (its PREFIX). Joining
    * prefix elements therefore misses NO qualifying pair; the exact
    * merge-walk Jaccard inside the join condition discards the rest.
    *
    * Scale shape: each doc emits ~(1-t)*m prefix rows (t=0.8 -> 20%
    * of its elements), the self-join is salted exactly like
    * [[lshJaccardPairs]], and pair work is sum over prefix-element
    * buckets of bucket^2 — corpus^2 never appears. Per-pair single
    * emission: a pair can collide on several shared prefix elements;
    * it is emitted only on the SMALLEST shared one (the prefix twin
    * of the first-colliding-band rule), so no DISTINCT pass. */
  private[graft] def prefixJaccardPairs(items: DataFrame, threshold: Double,
      scoreName: String): DataFrame = {
    val prefLen = greatest(lit(1),
      (size(col("th")) - ceil(size(col("th")) * lit(threshold)) + 1)
        .cast("int"))
    val docs = materializeOnce(items
      .withColumn("pref", slice(col("th"), lit(1), prefLen)))
    val emitted = docs.select(col("doc_id"), col("th"), col("pref"),
      explode(col("pref")).as("sh"))
    val G = SaltGroups
    val saltOf: Column => Column = id => pmod(xxhash64(id), lit(G)).cast("int")
    val a = emitted.select(col("sh"),
        col("doc_id").as("doc_a"), col("th").as("th_a"),
        col("pref").as("pref_a"))
      .withColumn("ga", saltOf(col("doc_a")))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val b = emitted.select(col("sh").as("sh_b"),
        col("doc_id").as("doc_b"), col("th").as("th_b"),
        col("pref").as("pref_b"))
      .withColumn("gb", saltOf(col("doc_b")))
      .withColumn("ga", explode(sequence(lit(0), lit(G - 1))))
      .withColumnsRenamed(Map("ga" -> "ga_b", "gb" -> "gb_b"))
    val jaccard = round(
      graft.functions.ArrayExprs.sortedLongJaccard(col("th_a"), col("th_b")), 4)
    val smallestShared =
      col("sh") === array_min(array_intersect(col("pref_a"), col("pref_b")))
    val cond = col("sh") === col("sh_b") &&
      col("ga") === col("ga_b") && col("gb") === col("gb_b") &&
      col("doc_a") < col("doc_b") && smallestShared && jaccard >= threshold
    a.repartition(JoinParallelism, col("sh"), col("ga"), col("gb"))
      .join(b.repartition(JoinParallelism, col("sh_b"), col("ga_b"), col("gb_b")),
        cond)
      .select(col("doc_a"), col("doc_b"), jaccard.as(scoreName))
  }

  /** Shingle-Jaccard near-dup pairs via the EXACT prefix filter — the
    * same pair set [[dedupNgramJaccard]] approximates with banding,
    * now with certainty instead of a recall curve. The DuckDB twin is
    * deliberately a BRUTE-FORCE all-pairs join (feasible at oracle
    * scale): the gate proves the prefix filter loses nothing against
    * an algorithm that shares none of its machinery. */
  def dedupPrefixJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), hashedShingles(col("text"), NgramN).as("th"))
    prefixJaccardPairs(docs, NgramThreshold, "ngram_jaccard")
  }

  val dedupPrefixJaccardSql: String = {
    val j = "round(CAST(len(list_intersect(a.th, b.th)) AS DOUBLE)" +
      " / len(list_distinct(list_concat(a.th, b.th))), 4)"
    s"""WITH d AS (
         SELECT doc_id, ${hashedShinglesSql(NgramN)} AS th FROM documents)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $j AS ngram_jaccard
       FROM d a JOIN d b ON a.doc_id < b.doc_id
       WHERE $j >= $NgramThreshold"""
  }

  /** Per-document n-gram NOVELTY: of each doc's distinct shingles,
    * how many appear in at least one OTHER document — the
    * memorization/boilerplate exposure signal (a doc whose grams are
    * mostly corpus-shared is template/duplicated matter even when no
    * single pair crosses a dedup threshold; the per-doc twin of the
    * corpus-wide repeated-span report). Exact integers: `n_grams` =
    * distinct shingles, `n_shared` = those with corpus document
    * frequency >= 2; novelty = 1 - n_shared/n_grams is the caller's
    * division.
    *
    * Scale shape: one explode of the per-doc distinct shingle sets,
    * one map-side-combinable groupBy on the gram, one join back and
    * one groupBy on the doc — cost O(total grams), never pairwise. */
  def textGramNovelty(s: SparkSession, dir: String): DataFrame = {
    val grams = materializeOnce(Tables.documents(s, dir)
      .repartition(JoinParallelism)
      .select(col("doc_id"),
        explode(hashedShingles(col("text"), NgramN)).as("g")))
    val df = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs_with"))
    grams.join(df, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_shared"))
  }

  val textGramNoveltySql: String =
    s"""WITH g AS (
         SELECT doc_id, unnest(${hashedShinglesSql(NgramN)}) AS g
         FROM documents),
       c AS (SELECT g, count(*) AS n_docs_with FROM g GROUP BY g)
       SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(count(*) FILTER (WHERE c.n_docs_with > 1) AS BIGINT)
                AS n_shared
       FROM g JOIN c ON g.g = c.g GROUP BY g.doc_id"""

  // ------------------------------------------------ LSH recall ladder

  /** Banding configurations for [[dedupLshRecall]]: every layout of
    * the 16-permutation signature from loose (8 bands of 2 rows —
    * high recall, many candidates) to strict (2 bands of 8 —
    * near-zero junk, recall follows 1-(1-s^8)^2). */
  val RecallLadderConfigs: Seq[(Int, Int)] = Seq((8, 2), (4, 4), (2, 8))

  /** MinHash-LSH RECALL LADDER — the dedup twin of the ANN recall
    * ladder (sim_ann_recall): for each banding layout of the same
    * 16-wide signature, count candidate pairs and verified hits, and
    * set them against the EXACT truth from [[prefixJaccardPairs]]
    * (whose own gate is brute-force-verified). One row per config:
    * (bands, rows_per_band, n_cand, n_hits, n_true), all exact
    * BIGINTs — recall = n_hits / n_true and precision = n_hits /
    * n_cand are the caller's division. This is the measurement that
    * justifies a banding choice BEFORE committing a 100 TB dedup run
    * to it. */
  def dedupLshRecall(s: SparkSession, dir: String): DataFrame = {
    // the shingle projection feeds FOUR pair generators (truth + 3
    // band configs): materialize it once — each generator still
    // materializes its own banded/prefixed projection on top
    val docs = materializeOnce(Tables.documents(s, dir)
      .repartition(JoinParallelism)
      .select(col("doc_id"), hashedShingles(col("text"), NgramN).as("th")))
    val truth = prefixJaccardPairs(docs, NgramThreshold, "j")
      .agg(count(lit(1)).as("n_true"))
    val perConfig = RecallLadderConfigs.map { case (bc, r) =>
      // threshold -1: every banded candidate survives the join and
      // carries its exact Jaccard; the ladder aggregates instead of
      // filtering
      lshJaccardPairs(docs, MinhashK, bc, r, -1.0, "j")
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("j") >= NgramThreshold, 1L).otherwise(0L))
            .as("n_hits"))
        .select(lit(bc).as("bands"), lit(r).as("rows_per_band"),
          col("n_cand"), col("n_hits"))
    }.reduce(_ unionByName _)
    perConfig.crossJoin(truth)
  }

  val dedupLshRecallSql: String = {
    val j = "round(CAST(len(list_intersect(da.th, db.th)) AS DOUBLE)" +
      " / len(list_distinct(list_concat(da.th, db.th))), 4)"
    val jt = "round(CAST(len(list_intersect(a.th, b.th)) AS DOUBLE)" +
      " / len(list_distinct(list_concat(a.th, b.th))), 4)"
    def config(bc: Int, r: Int): String = {
      val sig = minhashSigSql("th", MinhashK)
      val bands = lshBandsSql("sig", bc, r)
      s"""SELECT $bc AS bands, $r AS rows_per_band, n_cand, n_hits
          FROM (
            WITH sigs AS (SELECT doc_id, th, $sig AS sig FROM d),
            bnd AS (SELECT doc_id, $bands AS bands FROM sigs),
            buckets AS (
              SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
              FROM bnd, generate_series(1, $bc) gs(i)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM buckets a JOIN buckets b
                ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id)
            SELECT count(*) AS n_cand,
                   count(*) FILTER (WHERE $j >= $NgramThreshold) AS n_hits
            FROM cand JOIN d da ON cand.doc_a = da.doc_id
                      JOIN d db ON cand.doc_b = db.doc_id)"""
    }
    s"""WITH d AS (
         SELECT doc_id, ${hashedShinglesSql(NgramN)} AS th FROM documents),
       truth AS (
         SELECT count(*) AS n_true FROM d a JOIN d b
         ON a.doc_id < b.doc_id WHERE $jt >= $NgramThreshold),
       ladder AS (
         ${RecallLadderConfigs.map { case (bc, r) => config(bc, r) }
            .mkString("\n         UNION ALL\n         ")})
       SELECT bands, rows_per_band, n_cand, n_hits, n_true
       FROM ladder CROSS JOIN truth"""
  }

  // -------------------------------------------------------- edit distance

  /** Maximum Levenshtein distance for [[dedupEditDistance]]. Near-dup
    * replicas in realistic corpora (suffix stamps, single-token
    * swaps) sit at single-digit edit distances on ~300-char docs;
    * 16 keeps comfortable headroom without admitting rewrites. */
  val EditDistMax = 16

  /** Edit-distance near-dup pairs over a `(doc_id, text, th)` input:
    * the same banded MinHash blocking as the shingle-Jaccard path
    * generates candidates (candidate recall follows the banding
    * curve over SHINGLE similarity, which upper-bounds how far two
    * strings within a small edit distance can drift apart), then the
    * exact verifier is banded Levenshtein INSIDE the join condition:
    * `levenshtein(a, b, maxDist)` is Spark's threshold variant --
    * O(maxDist * len) Ukkonen band, returning -1 past the threshold
    * -- so a non-qualifying candidate costs a diagonal band walk,
    * not a full O(len^2) DP table, and never materializes an output
    * row. A `|len_a - len_b| <= maxDist` guard (a true lower bound
    * on edit distance) short-circuits even that.
    *
    * Same shuffle discipline as [[lshJaccardPairs]]: one compact row
    * per (doc, band) into the salted bucket join, pair uniqueness by
    * the first-colliding-band rule, no DISTINCT over pairs. */
  private[graft] def editDistancePairs(items: DataFrame, k: Int,
      bandCount: Int, rows: Int, maxDist: Int): DataFrame = {
    val docs = materializeOnce(items
      .withColumn("bands", lshBands(
        graft.functions.HashExprs.minhashSig(col("th"), k), bandCount, rows)))
    val buckets = docs.select(col("doc_id"), col("text"), col("bands"),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
    val G = SaltGroups
    val saltOf: Column => Column = id => pmod(xxhash64(id), lit(G)).cast("int")
    val a = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_a"), col("text").as("text_a"),
        col("bands").as("bands_a"))
      .withColumn("ga", saltOf(col("doc_a")))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val b = buckets.select(col("band_idx").as("bi_b"), col("band_hash").as("bh_b"),
        col("doc_id").as("doc_b"), col("text").as("text_b"),
        col("bands").as("bands_b"))
      .withColumn("gb_b", saltOf(col("doc_b")))
      .withColumn("ga_b", explode(sequence(lit(0), lit(G - 1))))
    val firstCollidingBand = (0 until bandCount).map { i =>
      col("band_idx") <= i || element_at(col("bands_a"), i + 1) =!= element_at(col("bands_b"), i + 1)
    }.reduce(_ && _)
    val dist = levenshtein(col("text_a"), col("text_b"), maxDist)
    val cond = col("band_idx") === col("bi_b") && col("band_hash") === col("bh_b") &&
      col("ga") === col("ga_b") && col("gb") === col("gb_b") &&
      col("doc_a") < col("doc_b") && firstCollidingBand &&
      abs(length(col("text_a")) - length(col("text_b"))) <= maxDist &&
      dist >= 0
    a.repartition(JoinParallelism, col("band_idx"), col("band_hash"), col("ga"), col("gb"))
      .join(b.repartition(JoinParallelism, col("bi_b"), col("bh_b"), col("ga_b"), col("gb_b")),
        cond)
      .select(col("doc_a"), col("doc_b"), dist.as("edit_dist"))
  }

  /** Levenshtein near-dup pairs over `documents` at edit distance
    * <= [[EditDistMax]] -- (doc_a, doc_b, edit_dist). Blocking reuses
    * the shingle-LSH banding of [[dedupNgramJaccard]]; the verifier
    * is character-level edit distance, so this is the strictest
    * member of the dedup family: it certifies near-IDENTITY, not
    * just shared vocabulary or shared runs.
    *
    * Cross-engine note: Spark's `levenshtein` counts CHARACTERS,
    * DuckDB's counts BYTES; the oracle corpus is pure ASCII (the
    * driver's fixture property), where the two coincide. The engine
    * side is the character-correct one for real data. */
  def dedupEditDistance(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), col("text"),
        hashedShingles(col("text"), NgramN).as("th"))
    editDistancePairs(docs, MinhashK, NgramBandCount, NgramLshRows, EditDistMax)
  }

  /** DuckDB twin of [[dedupEditDistance]]: identical banding over the
    * same shingle SQL, plain `levenshtein` (no threshold variant --
    * the oracle runs at gate scale) as the verifier. */
  val dedupEditDistanceSql: String = {
    val sig = minhashSigSql("th", MinhashK)
    val bands = lshBandsSql("sig", NgramBandCount, NgramLshRows)
    s"""WITH d AS (
         SELECT doc_id, text, ${hashedShinglesSql(NgramN)} AS th FROM documents),
       sigs AS (SELECT doc_id, th, $sig AS sig FROM d),
       bands AS (SELECT doc_id, $bands AS bands FROM sigs),
       buckets AS (
         SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
         FROM bands, generate_series(1, $NgramBandCount) gs(i)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM buckets a JOIN buckets b
           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b,
         CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
       FROM cand JOIN d da ON cand.doc_a = da.doc_id
                 JOIN d db ON cand.doc_b = db.doc_id
       WHERE levenshtein(da.text, db.text) <= $EditDistMax"""
  }

  // ------------------------------------------------- decontamination

  /** N-gram width for benchmark decontamination. Published practice
    * uses 13-gram collision (GPT-3 appendix C); the synthetic test
    * docs are short, so the default sits at 8 (the winnow window) --
    * the facade takes `n` per deployment. */
  val DecontaminationN = 8

  /** Benchmark decontamination -- the training-data op that keeps
    * eval integrity: flag every corpus document sharing at least one
    * hashed n-gram with the benchmark (eval-set) documents, with the
    * matching-gram count as evidence strength.
    *
    * Inputs are (doc_id, text) projections. Scale shape: the
    * benchmark side reduces to its DISTINCT hashed n-gram set --
    * eval suites are tiny next to a training corpus, so it
    * broadcasts; the corpus side is one narrow scan exploding each
    * doc's (already distinct) gram set into a broadcast-hash
    * semi-match and a map-side-combinable per-doc count. No shuffle
    * of corpus text, no all-pairs anything; output is only the
    * flagged docs. */
  private[graft] def decontaminationHits(corpus: DataFrame,
      benchmark: DataFrame, n: Int): DataFrame = {
    val bench = benchmark
      .select(explode(hashedShingles(col("text"), n)).as("g")).distinct()
    val corp = corpus
      .select(col("doc_id"), explode(hashedShingles(col("text"), n)).as("g"))
    corp.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Query binding: doc_id % 20 == 0 poses as the held-out benchmark,
    * the rest as the training corpus (the synthetic corpus carries
    * real duplicate groups, so contamination exists). */
  def dedupDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    decontaminationHits(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(20)) === 0),
      DecontaminationN)
  }

  val dedupDecontaminateSql: String = {
    val grams = hashedShinglesSql(DecontaminationN)
    s"""WITH bench AS (
         SELECT DISTINCT unnest($grams) AS g FROM documents WHERE doc_id % 20 = 0),
       corp AS (
         SELECT doc_id, unnest($grams) AS g FROM documents WHERE doc_id % 20 <> 0)
       SELECT c.doc_id, count(*) AS n_hits
       FROM corp c JOIN bench b ON c.g = b.g
       GROUP BY 1"""
  }

  // ----------------------------------------------------- containment

  val ContainmentThreshold = 0.8
  /** Bottom-k sketch width for containment candidate generation. */
  val ContainmentK = 6

  /** CONTAINMENT dedup -- the third dedup class after exact and
    * near-dup: a small document embedded inside a larger one scores
    * LOW on symmetric jaccard (so MinHash banding misses it by
    * design); the right score is |A inter B| / min(|A|,|B|).
    *
    * Candidate generation is an equi-join on a BOTTOM-K sketch of
    * the winnowing window hashes: each doc emits its K smallest
    * 60-bit hashes over all 8-token windows. A single global-min
    * fingerprint has recall ~|A|/|B| for A embedded in a much larger
    * B (B's minimum must land inside the shared region); the bottom-K
    * sketch collides when ANY of B's K smallest windows falls in A --
    * recall ~1-(1-|A|/|B|)^K, i.e. K-fold better exactly where
    * containment matters (small-in-large). Verification is the
    * native overlap merge walk inside the join condition; pair
    * uniqueness comes from emitting only at the pair's SMALLEST
    * shared fingerprint (the bottom-k analogue of the
    * first-colliding-band rule -- no DISTINCT over the pair blowup).
    * No all-pairs join: the fingerprint is a high-cardinality key.
    *
    * DETECTION FLOOR: documents shorter than 8 tokens hash as one
    * whole-text fingerprint, which can never equi-join a longer
    * document's 8-token window hashes -- containment of a sub-8-token
    * snippet inside a larger doc is out of scope by construction
    * (such snippets are below the resolution of an 8-token winnow and
    * would flood candidates with stopword-run collisions). The K-fold
    * recall bound above applies to contained docs of >= 8 tokens. */
  private[graft] def containmentPairs(docs: DataFrame,
      threshold: Double): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val windows = transform(sequence(lit(1), n - lit(7)),
      i => h15(array_join(slice(t, i, lit(8)), " ")))
    val fps = when(n < 8, array(h15(col("text"))))
      .otherwise(slice(array_sort(array_distinct(windows)), 1, ContainmentK))
    val f = materializeOnce(docs.repartition(JoinParallelism)
      .select(col("doc_id"), fps.as("fps"), hashedTokenSet(col("text")).as("th")))
    val x = f.select(col("doc_id"), col("fps"), col("th"),
      explode(col("fps")).as("fp"))
    val a = x.select(col("fp"), col("doc_id").as("doc_a"), col("th").as("th_a"),
      col("fps").as("fps_a"))
    val b = x.select(col("fp").as("fp_b"), col("doc_id").as("doc_b"),
      col("th").as("th_b"), col("fps").as("fps_b"))
    val containment = round(
      graft.functions.ArrayExprs.sortedLongOverlap(col("th_a"), col("th_b"))
        .cast("double") / least(size(col("th_a")), size(col("th_b"))), 4)
    // first-colliding-fingerprint: a pair sharing m sketch hashes
    // matches the equi-join m times; emit only where the joined hash
    // is the minimum of the shared set (arrays are <= K long, so the
    // intersect+min runs in constant time per candidate)
    val firstShared = col("fp") === array_min(array_intersect(col("fps_a"), col("fps_b")))
    a.join(b, col("fp") === col("fp_b") && col("doc_a") < col("doc_b") &&
        firstShared && containment >= threshold)
      .select(col("doc_a"), col("doc_b"), containment.as("containment"))
  }

  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      ContainmentThreshold)

  /** DuckDB twin of [[containmentPairs]], parameterized on the source
    * relation so composite pipelines (Corpus.prepare) can run it over
    * an upstream CTE. */
  def containmentPairsSql(from: String): String = {
    val fpsSql =
      s"""CASE WHEN len($TokensSql) < 8 THEN [${h15Sql("text")}]
         ELSE list_sort(list_distinct(list_transform(
                generate_series(1, len($TokensSql) - 7),
                i -> ${h15Sql(s"array_to_string(($TokensSql)[i:i+7], ' ')")})))[1:$ContainmentK]
         END"""
    val score = "round(CAST(len(list_intersect(fa.th, fb.th)) AS DOUBLE)" +
      " / least(len(fa.th), len(fb.th)), 4)"
    s"""WITH f AS (
         SELECT doc_id, $fpsSql AS fps, $HashedTokensSql AS th FROM $from),
       x AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM x a JOIN x b ON a.fp = b.fp AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, $score AS containment
       FROM cand JOIN f fa ON cand.doc_a = fa.doc_id
                 JOIN f fb ON cand.doc_b = fb.doc_id
       WHERE $score >= $ContainmentThreshold"""
  }

  val dedupContainmentSql: String = containmentPairsSql("documents")

  // ------------------------------------------------- near-dup clustering

  /** Loop-table rows are ~16-24 bytes; ~200k rows per task keeps the
    * per-round task count proportional to data (8 tasks at test scale,
    * thousands at 100 TB) without drowning small inputs in scheduling
    * overhead. */
  private def loopWidth(nRows: Long): Int =
    math.max(8L, math.min(4096L, nRows / 200000L + 1L)).toInt

  /** Materialize a DataFrame exactly once for multi-branch reuse:
    * reliable `checkpoint` when the session has a checkpoint dir
    * configured (long cluster jobs survive executor loss), else eager
    * `localCheckpoint` (fast; fine for short jobs and local mode).
    * Chosen over `persist` so repeated invocations stay independent
    * (no cross-run cache hits skewing measurements). */
  private[graft] def materializeOnce(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  /** Free the executor storage of a frame [[materializeOnce]]
    * returned. `Dataset.unpersist` cannot do this -- a local
    * checkpoint's blocks live on the RDD, not in the cache manager,
    * so unpersisting the Dataset is silently a no-op and an iterative
    * loop accumulates every superseded rank/label table for the
    * session. Matches ONLY a bare checkpoint scan (a frame with any
    * further lineage is left alone, so loop code may call this
    * unconditionally on its loop variable). Callers must have
    * materialized every downstream consumer first: a local checkpoint
    * has no lineage to recompute evicted blocks from. */
  private[graft] def releaseOnce(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Cut loop lineage: [[materializeOnce]] at a loop-proportional
    * partition count. */
  private def loopCheckpoint(df: DataFrame, parts: Int): DataFrame =
    materializeOnce(df.coalesce(parts))

  /** Connected components over an arbitrary undirected edge list:
    * `vertices` = one `id` column (unique ids; edge endpoints must be
    * a subset), `edges` = (`src`, `dst`); returns (id, component)
    * where component = the component's min id.
    * Iterative min-label propagation to fixpoint -- O(graph diameter)
    * DataFrame iterations, each a join + map-side-combinable min-agg,
    * with per-round checkpoints truncating the growing lineage (the
    * standard Spark iterative-algorithm pattern).
    *
    * Loop width scales with the data ([[loopWidth]]): the label table
    * is one row per vertex and the edge table shrinks every
    * contraction, so each round's task count follows the live row
    * count instead of a fixed constant. */
  def connectedComponents(vertices: DataFrame, edges0: DataFrame): DataFrame = {
    val pairs = edges0.select(col("src").as("doc_a"), col("dst").as("doc_b"))
    var edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    var nEdges = edges.count()
    // r15 (guide §2.4): the iteration runs over EDGE-TOUCHING vertices
    // only -- singleton vertices (no near-dup pair) are their own
    // component by definition and rejoin via one anti join at the end
    // instead of riding every round's label joins. The restriction is
    // FREE: because the initial labels are identities, round 1's
    // neighbor-min is just min(doc_b) per doc_a, so the fused
    // aggregation below replaces BOTH the identity-label checkpoint
    // over all |V| vertices (and its vertices.count() action) AND the
    // round-1 edges-to-labels equi-join -- one edge-sized aggregation
    // instead of a checkpoint plus a shuffle join, and its keys are
    // exactly the edge-touching vertices.
    val labelParts = loopWidth(nEdges)
    var labels: DataFrame = null
    var iter = 0
    // Boruvka-flavored loop: propagate min labels one hop, pointer-jump
    // (label := label(label)), then CONTRACT the graph through the
    // labels -- within-cluster edges become self-loops and disappear,
    // so the edge set collapses after the first round and the loop
    // terminates when no cross-label edges remain. Each round is a
    // handful of key-partitioned joins; lineage is cut per round with
    // eager checkpoints (superseded ones unpersisted).
    while (nEdges > 0 && iter < 20) {
      val edgeParts = loopWidth(nEdges)
      val propagated =
        if (labels == null)
          // fused init + round-1 propagation (identity labels):
          // label(doc_a) := least(doc_a, min over neighbors doc_b)
          edges.groupBy(col("doc_a")).agg(min(col("doc_b")).as("nmin"))
            .select(col("doc_a").as("doc_id"),
              least(col("doc_a"), col("nmin")).as("cluster_id"))
        else {
          val neighborMin = edges
            .join(labels, edges("doc_b") === labels("doc_id"))
            .groupBy(edges("doc_a").as("nid"))
            .agg(min(col("cluster_id")).as("nmin"))
          labels
            .join(neighborMin, labels("doc_id") === neighborMin("nid"), "left")
            .select(col("doc_id"),
              least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"))
        }
      val updated = loopCheckpoint(
        propagated.as("x")
          .join(propagated.as("y"), col("x.cluster_id") === col("y.doc_id"))
          .select(col("x.doc_id").as("doc_id"), col("y.cluster_id").as("cluster_id")),
        labelParts)
      val la = updated.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
      val lb = updated.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
      val contracted = loopCheckpoint(
        edges.join(la, "doc_a").join(lb, "doc_b")
          .filter(col("ca") =!= col("cb"))
          .select(col("ca").as("doc_a"), col("cb").as("doc_b"))
          .distinct(),
        edgeParts)
      // updated/contracted are eager checkpoints: the superseded
      // round's blocks are unreferenced now (releaseOnce, because
      // Dataset.unpersist cannot free local-checkpoint storage)
      if (labels != null) releaseOnce(labels)
      releaseOnce(edges)
      labels = updated
      edges = contracted
      nEdges = edges.count()
      iter += 1
    }
    releaseOnce(edges)
    // no edges at all: every vertex is its own component
    if (labels == null)
      return vertices.select(col("id"), col("id").as("component"))
    // Edge-emptiness means all classes merged, but docs deep in a
    // representative chain can lag the per-round two-level jump:
    // pointer-jump the (small) label table to its true fixpoint. The
    // change flag rides along in the jump join itself, so stability
    // costs a limit-1 probe on checkpointed data, not an extra join.
    var stable = false
    var jiter = 0
    // the loop variable is a lazy projection after round one, so
    // track the MATERIALIZED label table for release separately
    var lastLabels = labels
    while (!stable && jiter < 20) {
      val jumped = loopCheckpoint(
        labels.as("x")
          .join(labels.as("y"), col("x.cluster_id") === col("y.doc_id"))
          .select(col("x.doc_id").as("doc_id"), col("y.cluster_id").as("cluster_id"),
            (col("x.cluster_id") =!= col("y.cluster_id")).as("__chg")),
        labelParts)
      stable = jumped.filter(col("__chg")).isEmpty
      releaseOnce(lastLabels)
      lastLabels = jumped
      labels = jumped.select(col("doc_id"), col("cluster_id"))
      jiter += 1
    }
    // singleton vertices (no edge) re-enter here with component =
    // their own id -- one narrow anti join against the final label
    // table instead of |V| identity rows riding every loop round
    // above. The semi join keeps the output contract at one row per
    // `vertices` row (the label table's keys are edge endpoints,
    // which the contract requires to be a subset of `vertices`).
    val out = labels.select(col("doc_id").as("id"), col("cluster_id").as("component"))
      .join(vertices.select(col("id")), Seq("id"), "left_semi")
    val singletons = vertices
      .join(labels.select(col("doc_id").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    out.unionByName(singletons)
  }

  /** Near-dup clustering over `documents`: connected components of
    * the MinHash near-dup pair graph -- the dedup output users
    * actually consume (one cluster id per doc; the cluster's min
    * doc_id is the canonical survivor). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponents(Tables.documents(s, dir).select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE
       pairs AS (SELECT doc_a, doc_b FROM ($dedupMinhashLshSql) q),
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
       reach(doc, root) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.doc)
       SELECT doc AS doc_id, min(root) AS cluster_id FROM reach GROUP BY doc"""

  /** Quality-aware survivor selection + soft-dedup weights over the
    * near-dup clusters: per cluster, the SURVIVOR is the doc with the
    * most content (max n_chars; ties -> min doc_id — "keep the most
    * complete copy", the realistic alternative to min-id canonical),
    * and `n_docs` is the cluster size — the denominator for
    * soft-dedup reweighting (weight each cluster member 1/n instead
    * of dropping duplicates outright). All-exact columns; one extra
    * shuffle over the cluster assignment. */
  def dedupSurvivorPick(s: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(s, dir)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val j = clusters.join(docs, Seq("doc_id"))
    val agg = j.groupBy(col("cluster_id")).agg(
      count(lit(1)).as("n_docs"),
      max(col("n_chars")).as("survivor_chars"))
    j.join(agg, Seq("cluster_id"))
      .filter(col("n_chars") === col("survivor_chars"))
      .groupBy(col("cluster_id"), col("n_docs"), col("survivor_chars"))
      .agg(min(col("doc_id")).as("survivor_id"))
      .select(col("cluster_id"), col("survivor_id"), col("n_docs"),
        col("survivor_chars"))
  }

  val dedupSurvivorPickSql: String =
    s"""WITH clusters AS ($dedupClustersSql),
       j AS (SELECT c.doc_id, c.cluster_id, d.n_chars
             FROM clusters c JOIN documents d ON c.doc_id = d.doc_id),
       agg AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
                      max(n_chars) AS survivor_chars
               FROM j GROUP BY cluster_id)
       SELECT j.cluster_id, min(j.doc_id) AS survivor_id,
              a.n_docs, a.survivor_chars
       FROM j JOIN agg a ON j.cluster_id = a.cluster_id
       WHERE j.n_chars = a.survivor_chars
       GROUP BY j.cluster_id, a.n_docs, a.survivor_chars"""

  // --------------------------------------------------- embedding near-dup

  val CosineThreshold = 0.4

  /** Embedding-cosine near-dup pairs over `embeddings`, brute-force
    * within `label` blocks (correctness baseline; [[SimilarityOps]]
    * carries the sign-LSH scale path). Dot products fold
    * left-to-right in double -- bit-identical to the oracle. */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(JoinParallelism)
      .select(col("label"), col("vec_id"),
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

  /** Bucketed threshold for the LSH path: same-sign-bucket vectors
    * are already roughly aligned, so the near-dup bar sits higher
    * than the label-blocked baseline's. */
  val EmbedLshThreshold = 0.5

  /** Embedding near-dup pairs, the SCALE path: candidates from a
    * sign-LSH bucket equi-join (vectors agreeing on every hyperplane
    * sign), exact cosine verification inside the join condition.
    * Replaces the label-blocked all-pairs baseline at corpus scale:
    * hash-partition the table by bucket and each bucket's pair space
    * is an independent cell. Recall < 1 by construction (near-dups
    * straddling a hyperplane are missed) -- raise LshPlanes bits or
    * add multi-probe for tighter recall, exactly as in
    * [[SimilarityOps]]. */
  /** Parameterized core of the embedding-LSH dedup: `vectors` is a
    * (vec_id, v: array<double>) projection; `planes`/`dims` size the
    * bucket space to the deployment (2^planes buckets over
    * `dims`-wide embeddings) instead of pinning the test-table
    * defaults. */
  private[graft] def embedLshPairs(vectors: DataFrame, threshold: Double,
      planes: Int, dims: Int): DataFrame = {
    val bucketed = vectors.select(col("vec_id"), col("v"),
      sqrt(SimilarityOps.dot(col("v"), col("v"))).as("nrm"),
      SimilarityOps.signBucket(col("v"), planes, dims).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("bucket").as("bucket_b"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val cosine = round(SimilarityOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b") &&
        cosine >= threshold)
      .select(col("bucket"), col("vec_a"), col("vec_b"), cosine.as("cosine"))
  }

  def dedupEmbedLsh(s: SparkSession, dir: String): DataFrame =
    embedLshPairs(
      Tables.embeddings(s, dir).repartition(JoinParallelism)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      EmbedLshThreshold, SimilarityOps.LshPlanes, SimilarityOps.PlaneDims)

  val dedupEmbedLshSql: String =
    s"""WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
               ${SimilarityOps.signBucketSql("v")} AS bucket FROM e)
       SELECT CAST(a.bucket AS BIGINT) AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
       FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= $EmbedLshThreshold"""

  // ------------------------------------------- exact-substring repetition

  /** Tokens per repeated gram for the exact-substring pass. The
    * ExactSubstr family (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better") uses ~50-token windows on web
    * corpora; 8 matches the driver documents' length scale. */
  val SubstrGramLen = 8

  /** Exact-substring repetition detection: flag every maximal span of
    * >= [[SubstrGramLen]] tokens that appears VERBATIM more than once
    * anywhere in the corpus (across documents or within one). The
    * suffix-array formulation of ExactSubstr is inherently
    * single-machine; this is its scalable equi-join equivalent with
    * the window length fixed.
    *
    * Shape per stage, and why it scales:
    *  1. gram stream -- one narrow projection per doc:
    *     (doc_id, start, 60-bit gram hash), ~n_tokens rows per doc of
    *     ~24 bytes, built by a transform over the token array (no
    *     per-gram shuffle, no re-tokenize).
    *  2. repeated grams -- ONE map-side-combinable count on the gram
    *     hash; hashes with count > 1 semi-join back onto the stream
    *     (equi-join on the hash -- both sides shuffle on it, never a
    *     broadcast assumption: at corpus scale the repeated set is
    *     itself corpus-sized).
    *  3. span merge -- overlapping hit windows coalesce into islands
    *     via the classic prev-running-max window trick, one doc_id
    *     shuffle over the HIT positions only (sparse unless the doc
    *     is mostly duplicated -- exactly when you want the signal).
    *
    * Output per affected doc: repeated-gram count, merged span count,
    * repeated-token coverage and fraction -- the removal decision
    * (drop doc / cut spans) is a downstream projection. */
  def dedupSubstrSpans(s: SparkSession, dir: String): DataFrame =
    substrSpans(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      SubstrGramLen)

  /** Parameterized core over any (doc_id, text) projection. */
  private[graft] def substrSpans(docs: DataFrame, gramLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col("text"))
    val toks = docs
      .select(col("doc_id"), t.as("t"), size(t).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= gramLen)
    val grams = toks.select(col("doc_id"), col("n_tokens"),
        explode(transform(sequence(lit(0), size(col("t")) - gramLen),
          i => struct(i.as("start"),
            h15(concat_ws(" ", slice(col("t"), i + 1, lit(gramLen))))
              .as("gh")))).as("g"))
      .select(col("doc_id"), col("n_tokens"),
        col("g.start").as("start"), col("g.gh").as("gh"))
    val rep = grams.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("gh"))
    val hits = grams.join(rep, Seq("gh"), "left_semi")
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("prev_max", max(col("start")).over(wPrev))
      .withColumn("is_new", when(col("prev_max").isNull ||
        col("start") >= col("prev_max") + gramLen, 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(wRun))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(count(lit(1)).as("gi"),
        (max(col("start")) - min(col("start")) + gramLen).cast("long").as("cov"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("gi")).as("n_rep_grams"), count(lit(1)).as("n_spans"),
        sum(col("cov")).as("rep_tokens"))
      .select(col("doc_id"), col("n_rep_grams"), col("n_spans"),
        col("rep_tokens"),
        round(col("rep_tokens").cast("double") / col("n_tokens"), 4)
          .as("rep_frac"))
  }

  val dedupSubstrSpansSql: String = {
    val L = SubstrGramLen
    s"""WITH toks AS (
         SELECT doc_id, $TokensSql AS t, len($TokensSql) AS n_tokens
         FROM documents WHERE len($TokensSql) >= $L),
       g AS (
         SELECT doc_id, n_tokens, i - 1 AS start,
           ${h15Sql(s"array_to_string(t[i:i+${L - 1}], ' ')")} AS gh
         FROM (SELECT doc_id, n_tokens, t,
                 unnest(range(1, n_tokens - ${L - 2})) AS i FROM toks)),
       rep AS (SELECT gh FROM g GROUP BY gh HAVING count(*) > 1),
       hits AS (SELECT g.* FROM g WHERE gh IN (SELECT gh FROM rep)),
       marked AS (
         SELECT doc_id, n_tokens, start,
           CASE WHEN max(start) OVER w IS NULL
                  OR start >= max(start) OVER w + $L
                THEN 1 ELSE 0 END AS is_new
         FROM hits
         WINDOW w AS (PARTITION BY doc_id ORDER BY start
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       isl AS (
         SELECT doc_id, n_tokens, start,
           sum(is_new) OVER (PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM marked),
       agg1 AS (
         SELECT doc_id, n_tokens, island, count(*) AS gi,
                max(start) - min(start) + $L AS cov
         FROM isl GROUP BY 1, 2, 3)
       SELECT doc_id, CAST(sum(gi) AS BIGINT) AS n_rep_grams,
         count(*) AS n_spans, CAST(sum(cov) AS BIGINT) AS rep_tokens,
         round(CAST(sum(cov) AS BIGINT) / CAST(n_tokens AS DOUBLE), 4)
           AS rep_frac
       FROM agg1 GROUP BY doc_id, n_tokens"""
  }

  // ------------------------------------------------------------- SemDeDup

  /** Within-cell near-dup bar for the semantic pass: the cluster-then-
    * prune family (SemDeDup) prunes pairs that a global threshold
    * would, but only looks inside one coarse cell. */
  val SemanticThreshold = 0.4

  /** SemDeDup-shape semantic dedup: coarse-cluster the embedding
    * space, then prune near-duplicate pairs INSIDE each cell only,
    * keeping the min-vec_id representative. Survivors out as
    * (vec_id, cell).
    *
    * The three stages and their 100 TB shapes:
    *  1. cell assignment -- each vector scores against the coarse
    *     centroids (per-label 1e-6-quantized means, the same
    *     quantizer [[graft.api.Similarity.annIvf]] builds) via a
    *     BROADCAST of the k-row centroid table; argmax cell resolves
    *     with a (cscore desc, cell asc) row_number so float ties
    *     cannot diverge across engines. k is constant per deployment,
    *     so the assignment is one narrow pass.
    *  2. within-cell pairing -- a cell EQUI-join with the rounded
    *     cosine evaluated inside the join condition (never a
    *     post-join filter over a materialized pair set); sized by
    *     sum of cell^2, the SemDeDup contract (grow k with the
    *     corpus to bound cell size), never corpus^2.
    *  3. survivor cut -- drop set = right ends of qualifying pairs,
    *     LEFT ANTI back onto the assignment. The assignment frame
    *     feeds both pair sides and the anti join, so it materializes
    *     ONCE ([[materializeOnce]]) instead of recomputing the
    *     centroid scores per branch. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    semanticSurvivors(
      Tables.embeddings(s, dir).repartition(JoinParallelism)
        .select(col("label"), col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      SemanticThreshold)

  /** Parameterized SemDeDup core: `vectors` is a (label, vec_id,
    * v: array<double>) projection, `label` seeding the coarse
    * quantizer (per-label means become the centroids; any
    * partition-ish column works -- the final cells come from the
    * argmax re-assignment, not the seed). */
  private[graft] def semanticSurvivors(vectors: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vectors.withColumn("nrm", sqrt(SimilarityOps.dot(col("v"), col("v"))))
    val cent = SimilarityOps.labelCentroids(e, col("label"), col("v"))
      .select(col("label").as("cell"), col("cv"), col("cn"))
    val scored = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        round(SimilarityOps.dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("cscore"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val assigned = materializeOnce(scored
      .withColumn("rn", row_number().over(byVec)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("v"), col("nrm")))
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val cosine = round(SimilarityOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    val drops = a.join(b, col("cell") === col("cell_b") &&
        col("vec_a") < col("vec_b") && cosine >= threshold)
      .select(col("vec_b")).distinct()
    assigned
      .join(drops, col("vec_id") === col("vec_b"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  val dedupSemanticSql: String =
    s"""WITH e AS (
         SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT label, vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       cent AS (
         SELECT label AS cell, list(c ORDER BY pos) AS cv FROM (
           SELECT label, CAST(i - 1 AS INT) AS pos,
             round(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT))
               / (count(*) * 1e6), 6) AS c
           FROM embeddings, generate_series(1, 64) gs(i)
           GROUP BY 1, 2)
         GROUP BY 1),
       cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
       asg AS (
         SELECT vec_id, cell, v, nrm FROM (
           SELECT n.vec_id, cn.cell, n.v, n.nrm,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY round(list_dot_product(n.v, cn.cv) / (n.nrm * cn.cn), 6) DESC,
                        cn.cell ASC) AS rn
           FROM n, cn)
         WHERE rn = 1),
       drops AS (
         SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
           ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
               >= $SemanticThreshold)
       SELECT vec_id, cell FROM asg
       WHERE vec_id NOT IN (SELECT vec_id FROM drops)"""
}
