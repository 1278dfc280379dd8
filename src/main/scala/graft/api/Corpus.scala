package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, Hashing, SamplingOps, TextOps}

/** End-to-end training-corpus preparation: the composition a data
  * pipeline actually runs -- quality filter -> exact dedup -> near-dup
  * cluster dedup -> leakage-safe split assignment -- built from the
  * `graft.api` operators so every stage keeps its documented scale
  * shape (narrow projections, banded LSH joins, one iterative CC).
  *
  * Determinism: every stage is content- or id-hash keyed, so the
  * prepared corpus is identical under repartitioning, re-runs, and
  * retries -- the property that makes incremental corpus builds and
  * exact experiment reproduction possible.
  */
object Corpus {

  /** Tunable quality gates (defaults match common web-corpus
    * heuristics at small scale). */
  case class QualityThresholds(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      minLexicalDiversity: Double = 0.2,
      maxAvgTokenLen: Double = 20.0)

  /** Rows failing the quality gates, with the first failed gate named
    * (for corpus-loss audits). */
  def qualityRejects(docs: DataFrame, id: Column, text: Column,
      t: QualityThresholds = QualityThresholds()): DataFrame = {
    val s = Text.stats(docs, id, text)
    s.withColumn("reject_reason",
        when(col("n_tokens") < t.minTokens, "too_short")
          .when(col("n_tokens") > t.maxTokens, "too_long")
          .when(col("lexical_diversity") < t.minLexicalDiversity, "low_diversity")
          .when(col("avg_token_len") > t.maxAvgTokenLen, "gibberish_tokens"))
      .filter(col("reject_reason").isNotNull)
      .select(col("doc_id"), col("reject_reason"))
  }

  /** The full preparation pipeline. Returns the cleaned corpus:
    * (doc_id, text, content_key, component, split) where
    *  - quality rejects are removed ([[qualityRejects]]),
    *  - exactly one doc survives per canonical content key (min id),
    *  - exactly one doc survives per near-dup cluster (min id over
    *    the MinHash-LSH pair graph's connected component),
    *  - split is the 80/10/10 train/val/test assignment hashed on the
    *    COMPONENT id, so every surviving doc's near-dups (had they
    *    survived) would share its split -- no train/test leakage.
    *
    * `containmentThreshold = Some(t)` unions the CONTAINMENT pair
    * graph ([[Dedup.containmentPairs]]) into the cluster edges before
    * component assignment: a small document embedded inside a larger
    * one scores low on symmetric Jaccard (MinHash misses it by
    * design), so without this stage sub-document duplicates survive
    * corpus prep. Both pair generators are bucketed equi-joins over
    * the same materialized survivor table -- the union adds edges,
    * not a new corpus scan shape.
    *
    * Stage order matters at scale: the cheap narrow quality pass
    * shrinks the corpus before the (comparatively) expensive LSH
    * join; exact dedup before near-dup halves the pair-graph size on
    * crawl-style corpora. */
  def prepare(docs: DataFrame, id: Column, text: Column,
      t: QualityThresholds = QualityThresholds(),
      containmentThreshold: Option[Double] = None,
      paragraphSegmenter: Option[(DataFrame, Column, Column) => DataFrame]
        = None): DataFrame = {
    val raw = docs.select(id.as("doc_id"), text.as("text"))
    // 0. (opt-in) corpus-wide paragraph dedup BEFORE doc-level gating
    //    -- the CCNet order: boilerplate cut first so doc-level
    //    stats/fingerprints see real content; docs stripped to
    //    nothing fall to the quality gate's too_short rule
    val base = paragraphSegmenter.fold(raw) { seg =>
      DedupOps.paragraphDedupOf(seg(raw, col("doc_id"), col("text")))
        .select(col("doc_id"), col("text_dedup").as("text"))
    }
    // 1. quality gate (anti-join on the reject list: one narrow pass)
    val rejects = qualityRejects(base, col("doc_id"), col("text"), t)
    val clean = base.join(rejects, Seq("doc_id"), "left_anti")
    // 2. exact dedup: min id per canonical content key
    val keyed = clean.withColumn("content_key", DedupOps.contentKey(col("text")))
    val exactSurvivors = keyed
      .groupBy(col("content_key")).agg(min(col("doc_id")).as("doc_id"))
    // materialized once: the downstream pair generation, component
    // join, and vertex list all branch from this table -- without it
    // the quality + dedup chain re-executes per branch
    val exact = DedupOps.materializeOnce(
      keyed.join(exactSurvivors, Seq("content_key", "doc_id"), "left_semi"))
    // 3. near-dup cluster dedup: min id per connected component of
    //    the MinHash near-dup pair graph (plus, optionally, the
    //    containment pair graph -- sub-document duplicates)
    val minhash = Dedup.minhashPairs(exact, col("doc_id"), col("text"))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val pairs = containmentThreshold.fold(minhash) { th =>
      minhash.unionByName(
        Dedup.containmentPairs(exact, col("doc_id"), col("text"), th)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    }
    val comps = Dedup.connectedComponents(
      exact.select(col("doc_id").as("id")), pairs)
    val withComp = exact.join(comps, exact("doc_id") === comps("id"))
      .select(col("doc_id"), col("text"), col("content_key"), col("component"))
    val nearSurvivors = withComp
      .groupBy(col("component")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = withComp.join(nearSurvivors, Seq("component", "doc_id"), "left_semi")
    // 4. leakage-safe split: hash the component id, not the doc id
    val bucket = pmod(Hashing.h15(
      concat(lit("split:"), col("component").cast("string"))), lit(100))
    deduped.select(col("doc_id"), col("text"), col("content_key"), col("component"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
  }

  /** DuckDB twin of [[prepare]] at the default thresholds over the
    * driver's `documents` table -- the END-TO-END pipeline (quality
    * gate, exact dedup, LSH pair graph, optional containment pair
    * graph, recursive-CTE connected components, split hashing)
    * reproduced exactly for the oracle gate. */
  private def prepareSqlWith(containment: Boolean,
      paragraph: Boolean = false): String = {
    val t = TextOps.TokensSql
    val th = QualityThresholds()
    val minhashSql = DedupOps.lshJaccardPairsSql(DedupOps.HashedTokensSql,
      DedupOps.MinhashK, DedupOps.LshBandCount, DedupOps.LshRows,
      DedupOps.JaccardThreshold, "jaccard", from = "exact")
    val pairsSql =
      if (!containment) s"SELECT doc_a, doc_b FROM ($minhashSql) q"
      else s"""SELECT doc_a, doc_b FROM ($minhashSql) q
              UNION
              SELECT doc_a, doc_b
              FROM (${DedupOps.containmentPairsSql(from = "exact")}) cp"""
    val splitBucket =
      s"${Hashing.h15Sql("concat('split:', CAST(component AS VARCHAR))")} % 100"
    val w = DedupOps.ParaBlockTokens
    val baseSql =
      if (!paragraph) "base AS (SELECT doc_id, text FROM documents)"
      else s"""ptk AS (SELECT doc_id, $t AS tk FROM documents),
       pseg0 AS (SELECT doc_id,
           unnest(list_transform(
             generate_series(0, CAST(ceil(len(tk) / $w.0) AS INT) - 1),
             i -> {'idx': CAST(i AS INT),
                   'para': array_to_string(
                     tk[i*$w+1 : least((i+1)*$w, len(tk))], ' ')})) AS s
         FROM ptk),
       pseg AS (SELECT doc_id, s.idx AS idx, s.para AS para FROM pseg0),
       pk AS (SELECT doc_id, idx, para,
           (row_number() OVER (PARTITION BY md5(para)
              ORDER BY doc_id, idx) = 1) AS kept FROM pseg),
       base AS (SELECT doc_id,
           coalesce(array_to_string(array_agg(para ORDER BY idx)
             FILTER (WHERE kept), ' '), '') AS text
         FROM pk GROUP BY 1)"""
    s"""WITH RECURSIVE $baseSql,
       st AS (SELECT doc_id,
           len($t) AS n_tokens,
           round(CAST(len(list_distinct($t)) AS DOUBLE) / len($t), 4) AS lexical_diversity,
           round(CAST(list_sum(list_transform($t, x -> length(x))) AS DOUBLE) / len($t), 4) AS avg_token_len
         FROM base),
       rejects AS (SELECT doc_id FROM st
         WHERE n_tokens < ${th.minTokens} OR n_tokens > ${th.maxTokens}
            OR lexical_diversity < ${th.minLexicalDiversity}
            OR avg_token_len > ${th.maxAvgTokenLen}),
       clean AS (SELECT * FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM rejects)),
       keyed AS (SELECT doc_id, text,
           md5(array_to_string(list_sort(list_distinct($t)), ' ')) AS content_key
         FROM clean),
       exact AS (SELECT k.doc_id, k.text, k.content_key FROM keyed k
         JOIN (SELECT content_key, min(doc_id) AS doc_id FROM keyed GROUP BY 1) sv
           ON k.content_key = sv.content_key AND k.doc_id = sv.doc_id),
       pr AS ($pairsSql),
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
                 UNION ALL SELECT doc_b, doc_a FROM pr),
       reach(doc, root) AS (
         SELECT doc_id, doc_id FROM exact
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.doc),
       comp AS (SELECT doc AS doc_id, min(root) AS component FROM reach GROUP BY 1),
       wc AS (SELECT x.doc_id, x.text, x.content_key, c.component
              FROM exact x JOIN comp c ON x.doc_id = c.doc_id),
       ns AS (SELECT component, min(doc_id) AS doc_id FROM wc GROUP BY 1),
       deduped AS (SELECT w.doc_id, w.text, w.content_key, w.component FROM wc w
         JOIN ns ON w.component = ns.component AND w.doc_id = ns.doc_id)
       SELECT doc_id, text, content_key, component,
         CASE WHEN $splitBucket < 80 THEN 'train'
              WHEN $splitBucket < 90 THEN 'val' ELSE 'test' END AS split
       FROM deduped"""
  }

  val prepareSql: String = prepareSqlWith(containment = false)

  /** Oracle twin of [[prepare]] with the containment stage on. */
  val prepareContainmentSql: String = prepareSqlWith(containment = true)

  /** Oracle twin of [[prepare]] with the paragraph-dedup stage on
    * (fixed-width block segmentation -- the oracle corpus has no
    * newline structure). */
  val prepareParagraphSql: String =
    prepareSqlWith(containment = false, paragraph = true)

  /** Per-stage corpus-loss accounting for a [[prepare]] run over the
    * same inputs: one row per stage with rows_in/rows_out. Runs the
    * same stage predicates; intended for audit dashboards, not the
    * hot path. */
  /** Deterministic source mixing over arbitrary columns: downsample
    * each source to its weighted share of a global size budget (see
    * [[graft.ops.SamplingOps.mixtureSampleOf]] for the rate math and
    * scale shape). `size` is the per-doc size signal (chars, tokens,
    * bytes). Returns (doc_id, source, n_chars, keep_bp). */
  def mixtureSample(docs: DataFrame, id: Column, source: Column, size: Column,
      weights: Seq[(String, Int)], defaultWeight: Int = 1,
      budgetPct: Int = 40): DataFrame =
    graft.ops.SamplingOps.mixtureSampleOf(
      docs.select(id.as("doc_id"), source.as("source"), size.as("n_chars")),
      weights, defaultWeight, budgetPct)

  /** Temperature-rebalanced mixture (alpha = 0.5): per-source budget
    * share proportional to sqrt(source size) -- up-weights small
    * sources with NO hand-set weight list, the multilingual
    * exponent-smoothing recipe. alpha fixed at 0.5 for cross-engine
    * exactness (IEEE sqrt is correctly rounded; pow is not). */
  def temperatureMixture(docs: DataFrame, id: Column, source: Column,
      size: Column, budgetPct: Int = 40): DataFrame =
    graft.ops.SamplingOps.temperatureMixtureOf(
      docs.select(id.as("doc_id"), source.as("source"), size.as("n_chars")),
      budgetPct)

  /** Cap every source at its top-n docs by `priority` (descending,
    * id tie-break) -- the balancer that stops one crawl dominating a
    * mix. Exact under any skew: salted shard-local top-n, then the
    * finalists meet in the final per-source window. */
  def sourceCap(docs: DataFrame, id: Column, source: Column,
      priority: Column, n: Int): DataFrame =
    graft.ops.SamplingOps.sourceCapOf(
      docs.select(id.as("doc_id"), source.as("source"),
        priority.as("n_chars")), n)

  /** Exact uniform k-sample per group (hash-ranked: deterministic,
    * re-run- and partition-stable -- the reservoir-sample twin
    * without rand()). Skew-proof two-stage windows like
    * [[sourceCap]]. */
  def groupSample(docs: DataFrame, id: Column, group: Column,
      n: Int): DataFrame =
    graft.ops.SamplingOps.groupSampleOf(
      docs.select(id.as("doc_id"), group.as("grp")), n)

  /** Deterministic global training-order shuffle + shard assignment
    * over an arbitrary id column: (doc_id, ord, global_pos, shard,
    * pos_in_shard), where global_pos is the doc's exact 0-based rank
    * in a hash-pseudorandom permutation -- computed with NO global
    * sort (see [[graft.ops.SamplingOps.shuffleShardOf]] for the
    * two-phase bucket-rank shape). */
  def shuffleShard(docs: DataFrame, id: Column,
      buckets: Int = SamplingOps.ShuffleBuckets,
      shardDocs: Int = SamplingOps.ShardDocs): DataFrame =
    SamplingOps.shuffleShardOf(docs.select(id.as("doc_id")), buckets, shardDocs)

  /** Export the corpus as size-bounded, order-reproducible training
    * shards: every doc lands in exactly one `shard=N/` hive dir
    * (`shardDocs` docs per shard, the last one partial), rows inside
    * a shard file are stored in the global pseudorandom training
    * order, and the entire layout -- membership AND order -- is
    * bit-reproducible across re-runs, input partitionings, and
    * cluster sizes (the property rand()-based shuffles cannot give).
    * Cost on top of the assignment plan: one broadcast-joinable or
    * key-shuffled id join plus the shard repartition; each shard
    * hashes to exactly one task, so a shard is one file. */
  def exportShards(docs: DataFrame, id: Column, outPath: String,
      shardDocs: Int = SamplingOps.ShardDocs,
      buckets: Int = SamplingOps.ShuffleBuckets): Unit = {
    val base = docs.withColumn("__sid", id)
    val assign = SamplingOps.shuffleShardOf(
      docs.select(id.as("doc_id")), buckets, shardDocs)
      .select(col("doc_id").as("__sid"), col("global_pos"),
        col("shard"), col("pos_in_shard"))
    base.join(assign, "__sid").drop("__sid")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos_in_shard"))
      .write.partitionBy("shard")
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists).parquet(outPath)
  }

  def prepareStats(docs: DataFrame, id: Column, text: Column,
      t: QualityThresholds = QualityThresholds()): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val n0 = base.count()
    val rejects = qualityRejects(base, col("doc_id"), col("text"), t)
    val clean = base.join(rejects, Seq("doc_id"), "left_anti")
    val n1 = clean.count()
    val n2 = clean.select(DedupOps.contentKey(col("text")).as("k"))
      .agg(count_distinct(col("k"))).as[Long].head()
    val prepared = prepare(docs, id, text, t)
    val n3 = prepared.count()
    Seq(
      ("input", n0, n0),
      ("quality_filter", n0, n1),
      ("exact_dedup", n1, n2),
      ("near_dup_dedup", n2, n3)).toDF("stage", "rows_in", "rows_out")
  }

  /** The last mile: [[prepare]] -> context-window chunking -> concat-
    * and-chunk packing into `budgetTokens`-token training bins, one
    * bin stream per SPLIT (train/val/test never share a bin). Returns
    * one row per chunk: (doc_id, chunk_id, split, n_chunk_tokens,
    * chunk_text, start_offset, bin_first, bin_last, straddles).
    *
    * Scale shape: chunking is the shuffle-free explode; the pack
    * offsets come from [[TextOps.BoundedWindows prefix-sum]]'s
    * bucket-offset decomposition -- split has THREE values at any
    * corpus size, so a plain per-split window would sort a third of
    * the corpus in one task; the bounded shape shuffles only
    * (doc_id, chunk_id, split, n) -- never chunk text -- in
    * per-(split, doc_id-bucket) partitions
    * ([[graft.ops.BoundedWindows.prefixSum]]), and the arithmetic is
    * integer-exact so the bin layout the oracle pins is unchanged. */
  def trainingChunks(docs: DataFrame, id: Column, text: Column,
      t: QualityThresholds = QualityThresholds(),
      containmentThreshold: Option[Double] = None,
      chunkTokens: Int = TextOps.ChunkTokens,
      budgetTokens: Long = TextOps.PackBudget): DataFrame = {
    // materialized once: both the chunk explode and the split join
    // read the prepared corpus -- without this the whole prepare
    // pipeline (LSH pair join + CC loop) executes twice
    val prepared = DedupOps.materializeOnce(
      prepare(docs, id, text, t, containmentThreshold))
    val chunks = TextOps.chunkOf(
      prepared.select(col("doc_id"), col("text")), chunkTokens)
      .join(prepared.select(col("doc_id"), col("split")), Seq("doc_id"))
    graft.ops.BoundedWindows.prefixSum(chunks,
      parts = Seq("split"), ord = "doc_id", ties = Seq("chunk_id"),
      value = col("n_chunk_tokens"), outCol = "end_offset")
      .select(
        col("doc_id"), col("chunk_id"), col("split"), col("n_chunk_tokens"),
        col("chunk_text"),
        (col("end_offset") - col("n_chunk_tokens")).as("start_offset"),
        expr(s"(end_offset - n_chunk_tokens) DIV $budgetTokens").as("bin_first"),
        expr(s"(end_offset - 1) DIV $budgetTokens").as("bin_last"))
      .withColumn("straddles", col("bin_first") < col("bin_last"))
  }

  /** DuckDB twin of [[trainingChunks]] at the defaults (no
    * containment stage): chunk + pack CTEs layered over
    * [[prepareSql]]. */
  val trainingChunksSql: String = {
    val ct = TextOps.ChunkTokens
    val b = TextOps.PackBudget
    s"""WITH p0 AS ($prepareSql),
       w AS (
         SELECT doc_id, split, string_split(text, ' ') AS toks,
           unnest(generate_series(1, greatest(len(string_split(text, ' ')), 1), $ct)) AS st
         FROM p0),
       c AS (
         SELECT doc_id, CAST((st - 1) // $ct AS INT) AS chunk_id, split,
           CAST(len(toks[st:st + ${ct - 1}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[st:st + ${ct - 1}], ' ') AS chunk_text
         FROM w),
       o AS (
         SELECT *, CAST(sum(n_chunk_tokens)
             OVER (PARTITION BY split ORDER BY doc_id, chunk_id) AS BIGINT) AS end_offset
         FROM c)
       SELECT doc_id, chunk_id, split, n_chunk_tokens, chunk_text,
         end_offset - n_chunk_tokens AS start_offset,
         (end_offset - n_chunk_tokens) // $b AS bin_first,
         (end_offset - 1) // $b AS bin_last,
         ((end_offset - n_chunk_tokens) // $b) < ((end_offset - 1) // $b) AS straddles
       FROM o"""
  }
}
