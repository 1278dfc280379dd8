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
    array_sort(array_distinct(transform(tokens(text), t => h31(t))))

  val HashedTokensSql: String =
    s"list_sort(list_distinct(list_transform($TokensSql, t -> ${h31Sql("t")})))"

  /** MinHash + LSH near-duplicate pairs: signature -> band buckets ->
    * equi-join candidates -> exact-Jaccard verification >= 0.9 over
    * the hashed token sets. Returns (doc_a, doc_b, jaccard).
    * Candidate recall follows the banding curve
    * P(candidate) = 1-(1-j^rows)^bands.
    *
    * Shuffle discipline: the bucket join shuffles one compact row per
    * (doc, band) -- the candidate-pair blowup happens inside the join
    * stage and is consumed inline (merge-walk Jaccard + filter), never
    * re-shuffled. Pair uniqueness comes from the first-colliding-band
    * rule (emit at band b only if no earlier band also collided)
    * instead of a multi-million-row DISTINCT. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // repartition BEFORE the hash-heavy projection: the raw scan is
    // often one small file = one task; the signature computation must
    // run wide (and is recomputed per join branch)
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("doc_id"), hashedTokenSet(col("text")).as("th"))
      .withColumn("bands", lshBands(minhashSig(col("th"), MinhashK), LshBandCount, LshRows))
    // posexplode_outer, deliberately: plain posexplode triggers
    // InferFiltersFromGenerate, whose `size(bands) > 0` filter gets
    // pushed through the projections to the scan WITH the whole
    // 16-permutation signature expression inlined -- recomputing the
    // signatures serially at the (1-file) scan. bands is always
    // length-2, so outer-explode is semantically identical.
    val buckets = docs.select(col("doc_id"), col("th"), col("bands"),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
    // Salted self-join: near-dup corpora put thousands of docs in one
    // band bucket, so the bucket id alone is a skewed join key (two
    // buckets can hold >90% of all pairs). Salt each side G ways by
    // doc_id so a bucket's pair space splits into G^2 independently
    // joined cells; every (a,b) pair still matches exactly once, on
    // key (band, g(a), g(b)). The emitted pair SET is unchanged.
    val G = SaltGroups
    val a = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_a"), col("th").as("th_a"), col("bands").as("bands_a"))
      .withColumn("ga", (col("doc_a") % G).cast("int"))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val b = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_b"), col("th").as("th_b"), col("bands").as("bands_b"))
      .withColumn("gb", (col("doc_b") % G).cast("int"))
      .withColumn("ga", explode(sequence(lit(0), lit(G - 1))))
    val firstCollidingBand = (0 until LshBandCount).map { i =>
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
      col("doc_a") < col("doc_b") && firstCollidingBand && jaccard >= JaccardThreshold
    a.repartition(JoinParallelism, col("band_idx"), col("band_hash"), col("ga"), col("gb"))
      .join(bR.repartition(JoinParallelism, col("bi_b"), col("bh_b"), col("ga_b"), col("gb_b")),
        cond)
      .select(col("doc_a"), col("doc_b"), jaccard.as("jaccard"))
  }

  val dedupMinhashLshSql: String = {
    val sig = minhashSigSql("th", MinhashK)
    val bands = lshBandsSql("sig", LshBandCount, LshRows)
    s"""WITH d AS (
         SELECT doc_id, $HashedTokensSql AS th FROM documents),
       sigs AS (SELECT doc_id, th, $sig AS sig FROM d),
       bands AS (SELECT doc_id, $bands AS bands FROM sigs),
       buckets AS (
         SELECT doc_id, i - 1 AS band_idx, bands[i] AS band_hash
         FROM bands, generate_series(1, ${LshBandCount}) gs(i)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM buckets a JOIN buckets b
           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(da.th, db.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db.th))), 4) AS jaccard
       FROM cand JOIN d da ON cand.doc_a = da.doc_id
                 JOIN d db ON cand.doc_b = db.doc_id
       WHERE round(CAST(len(list_intersect(da.th, db.th)) AS DOUBLE)
           / len(list_distinct(list_concat(da.th, db.th))), 4) >= $JaccardThreshold"""
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

  /** SimHash near-dup pairs: hamming distance <= 4 within `lang`
    * blocks. bit_count(a XOR b) over one long per doc -- the pairwise
    * step touches 8 bytes per doc, not the token sets. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val fp = simhashFingerprints(s, dir)
    // rows here are (lang, id, one long) -- 16 bytes/doc. The blocked
    // pair join moves so little data that salting/explicit
    // repartitioning costs more than it saves (measured); a plain
    // broadcast-able join wins until block sizes reach ~10^5 docs,
    // where the minhash-style salted join takes over.
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
         FROM bits GROUP BY 1, 2)
       SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold"""

  // -------------------------------------------------------- n-gram jaccard

  val NgramN = 3
  val NgramThreshold = 0.02

  /** Sorted distinct 60-bit-hashed word n-gram (shingle) set. */
  def hashedShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(t) - lit(n - 1), lit(1))),
      i => h15(array_join(slice(t, i, lit(n)), " ")))))
  }

  def hashedShinglesSql(n: Int): String =
    s"list_sort(list_distinct(list_transform(" +
      s"generate_series(1, greatest(len($TokensSql) - ${n - 1}, 1)), " +
      s"i -> ${h15Sql(s"array_to_string(($TokensSql)[i:i+${n - 1}], ' ')")})))"

  /** n-gram Jaccard near-dup pairs, blocked by (lang, source) --
    * pairwise comparison only within natural partitions, merge-walk
    * Jaccard over hashed shingle sets. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).repartition(JoinParallelism)
      .select(col("lang"), col("source"),
        col("doc_id"), hashedShingles(col("text"), NgramN).as("sh"))
    val left = docs.select(col("lang"), col("source"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val right = docs.select(col("lang").as("lang_b"), col("source").as("source_b"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val jaccard =
      round(graft.functions.ArrayExprs.sortedLongJaccard(col("sh_a"), col("sh_b")), 4)
    // pinned join width + verification inside the join condition, as
    // in dedupMinhashLsh
    val cond = col("lang") === col("lang_b") && col("source") === col("source_b") &&
      col("doc_a") < col("doc_b") && jaccard >= NgramThreshold
    left.repartition(JoinParallelism, col("lang"), col("source"))
      .join(right.repartition(JoinParallelism, col("lang_b"), col("source_b")), cond)
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        jaccard.as("ngram_jaccard"))
  }

  val dedupNgramJaccardSql: String = {
    val sh = hashedShinglesSql(NgramN)
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

  // ------------------------------------------------- near-dup clustering

  /** Connected components over the MinHash near-dup pair graph: the
    * dedup output users actually consume (one cluster id per doc; the
    * cluster's min doc_id is the canonical survivor). Iterative
    * min-label propagation to fixpoint -- O(graph diameter)
    * DataFrame iterations, each a join + map-side-combinable min-agg,
    * with localCheckpoint truncating the growing lineage (the
    * standard Spark iterative-algorithm pattern). Near-dup components
    * are dense, so the fixpoint lands in a handful of rounds. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    // loop tables are small relative to the pair-join width; coalesce
    // before each checkpoint so per-round task overhead stays low
    val loopParts = 8
    var edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .coalesce(loopParts)
      .localCheckpoint(true)
    var labels = Tables.documents(s, dir)
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .coalesce(loopParts)
      .localCheckpoint(true)
    var nEdges = edges.count()
    var iter = 0
    // Borůvka-flavored loop: propagate min labels one hop, pointer-jump
    // (label := label(label)), then CONTRACT the graph through the
    // labels -- within-cluster edges become self-loops and disappear,
    // so the edge set collapses after the first round and the loop
    // terminates when no cross-label edges remain. Each round is a
    // handful of key-partitioned joins; lineage is cut per round with
    // eager localCheckpoints (superseded ones unpersisted).
    while (nEdges > 0 && iter < 20) {
      val neighborMin = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("nid"))
        .agg(min(col("cluster_id")).as("nmin"))
      val propagated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("nid"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"))
      val updated = propagated.as("x")
        .join(propagated.as("y"), col("x.cluster_id") === col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.cluster_id").as("cluster_id"))
        .coalesce(loopParts)
        .localCheckpoint(true)
      val la = updated.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
      val lb = updated.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
      val contracted = edges.join(la, "doc_a").join(lb, "doc_b")
        .filter(col("ca") =!= col("cb"))
        .select(col("ca").as("doc_a"), col("cb").as("doc_b"))
        .distinct()
        .coalesce(loopParts)
        .localCheckpoint(true)
      labels.unpersist()
      edges.unpersist()
      labels = updated
      edges = contracted
      nEdges = edges.count()
      iter += 1
    }
    edges.unpersist()
    // Edge-emptiness means all classes merged, but docs deep in a
    // representative chain can lag the per-round two-level jump:
    // pointer-jump the (small) label table to its true fixpoint.
    var stable = false
    var jiter = 0
    while (!stable && jiter < 20) {
      val jumped = labels.as("x")
        .join(labels.as("y"), col("x.cluster_id") === col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.cluster_id").as("cluster_id"))
        .coalesce(8)
        .localCheckpoint(true)
      stable = jumped.as("u")
        .join(labels.as("l"), col("u.doc_id") === col("l.doc_id"))
        .filter(col("u.cluster_id") =!= col("l.cluster_id"))
        .count() == 0
      labels.unpersist()
      labels = jumped
      jiter += 1
    }
    labels
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
}
