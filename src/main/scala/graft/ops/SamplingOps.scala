package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Hashing._

/** Deterministic sampling / dataset-split operators -- `sample()` and
  * `rand()` are partition-dependent in Spark (resampling whenever the
  * partitioning changes), so training pipelines key sampling off a
  * content/id hash instead: stable under repartitioning, re-runs, and
  * engine changes, and exactly reproducible by the oracle. */
object SamplingOps {

  val SamplePercent = 10

  /** ~10% Bernoulli-by-hash sample of documents, keyed on content so
    * near-identical re-crawls sample consistently. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        pmod(h15(col("text")), lit(100)).as("bucket"))
      .filter(col("bucket") < SamplePercent)

  val hashSampleSql: String =
    s"""SELECT doc_id, lang, ${h15Sql("text")} % 100 AS bucket
       FROM documents WHERE ${h15Sql("text")} % 100 < $SamplePercent"""

  /** Per-stratum sampling fractions for the stratified sample --
    * the deterministic twin of `DataFrameStatFunctions.sampleBy`
    * (which is rand()-seeded and partition-dependent). */
  val StrataFractions: Seq[(String, Int)] =
    Seq("en" -> 20, "de" -> 50, "fr" -> 50, "es" -> 100)

  /** Stratified hash sample: per-language sampling percents applied
    * via the content-hash bucket, so each stratum is downsampled to
    * its own rate deterministically (rebalancing skewed language
    * mixes is the canonical training-data use). Unlisted strata are
    * dropped. One narrow filter pass -- no shuffle, no rand(). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val pct = StrataFractions.foldLeft(lit(0)) { case (acc, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        pmod(h15(col("text")), lit(100)).as("bucket"), pct.as("stratum_pct"))
      .filter(col("bucket") < col("stratum_pct"))
  }

  val stratifiedSampleSql: String = {
    val pct = StrataFractions.reverse.foldLeft("0") { case (acc, (l, p)) =>
      s"CASE WHEN lang = '$l' THEN $p ELSE $acc END"
    }
    s"""SELECT doc_id, lang, ${h15Sql("text")} % 100 AS bucket,
       CAST($pct AS INT) AS stratum_pct
       FROM documents
       WHERE ${h15Sql("text")} % 100 < $pct"""
  }

  /** Train/val/test split assignment by id hash: 80/10/10. Keyed on
    * doc_id (not content) so duplicates of one document can land in
    * different splits only if their ids differ -- pair with
    * [[DedupOps.dedupClusters]] upstream to prevent leakage. */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(h15(concat(lit("split:"), col("doc_id").cast("string"))), lit(100))
    Tables.documents(s, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
  }

  val splitAssignSql: String = {
    val b = s"${h15Sql("concat('split:', CAST(doc_id AS VARCHAR))")} % 100"
    s"""SELECT doc_id, $b AS bucket,
       CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val'
            ELSE 'test' END AS split
       FROM documents"""
  }

  /** Source mixture weights: named sources are upweighted relative to
    * the default-1 remainder (the "3x Wikipedia" knob of a training
    * mix). */
  val MixtureWeights: Seq[(String, Int)] = Seq("src0" -> 4, "src1" -> 4, "src2" -> 2)
  val MixtureDefaultWeight = 1

  /** Char budget as a percent of the total corpus: the mixture keeps
    * ~this much of the data overall, redistributed by weight. */
  val MixtureBudgetPct = 40

  /** Mixture sampling: downsample each source to its weighted share of
    * a global char budget -- the canonical training-data mixing op
    * (upweight curated sources, cap the crawl). Per-source keep rates
    * derive from one map-side-combinable aggregate; all rate math is
    * BIGINT division so both engines compute identical rates; the
    * per-row keep decision is the usual content-free id-hash Bernoulli
    * filter. Sources whose weighted share exceeds their size keep
    * everything (rate clips at 100%) -- the leftover budget is NOT
    * redistributed (single-pass waterfilling is deliberately out:
    * iterative redistribution is a driver loop, and the point is one
    * broadcast joinable 20-row rate table at any corpus size). */
  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    mixtureSampleOf(Tables.documents(s, dir), MixtureWeights,
      MixtureDefaultWeight, MixtureBudgetPct)

  /** df-first form over any (doc_id, source, n_chars) frame. */
  def mixtureSampleOf(docs: DataFrame, weights: Seq[(String, Int)],
      defaultWeight: Int, budgetPct: Int): DataFrame = {
    // a repeated source would resolve last-entry-wins in this fold but
    // first-entry-wins in the SQL CASE twin (built reversed) -- reject
    // rather than let the engines diverge silently
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in mixture weights: ${weights.map(_._1)}")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (src, p)) => when(col("source") === src, lit(p)).otherwise(acc)
    }
    // materialized: both the rate projection and the grand total read
    // this 1-row-per-source aggregate -- without it each branch
    // re-scans the corpus (verified in the executed plan)
    val perSrc = DedupOps.materializeOnce(docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("chars_src"))
      .withColumn("w", w.cast("long")))
    val tot = perSrc.agg(sum(col("chars_src")).as("tot_chars"),
      sum(col("w")).as("tot_w"))
    // greatest(1, chars_src): an all-empty source otherwise divides by
    // zero -- Spark DIV yields null (source silently dropped) while
    // the DuckDB twin ERRORS; pinning the floor keeps both engines on
    // the same (degenerate: keep-all) answer
    val rates = perSrc.crossJoin(broadcast(tot)).select(
      col("source"),
      least(lit(10000L),
        expr(s"((tot_chars * $budgetPct DIV 100) * w DIV tot_w) " +
          "* 10000 DIV greatest(1, chars_src)")).as("keep_bp"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(h15(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(10000)) < col("keep_bp"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("keep_bp"))
  }

  val mixtureSampleSql: String = {
    val w = MixtureWeights.reverse.foldLeft(MixtureDefaultWeight.toString) {
      case (acc, (src, p)) => s"CASE WHEN source = '$src' THEN $p ELSE $acc END"
    }
    s"""WITH per AS (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars_src,
           CAST($w AS BIGINT) AS w
         FROM documents GROUP BY 1),
       tot AS (SELECT CAST(sum(chars_src) AS BIGINT) AS tot_chars,
                      CAST(sum(w) AS BIGINT) AS tot_w FROM per),
       rates AS (
         SELECT source,
           least(10000, ((tot_chars * $MixtureBudgetPct // 100) * w // tot_w)
             * 10000 // greatest(1, chars_src)) AS keep_bp
         FROM per CROSS JOIN tot)
       SELECT d.doc_id, d.source, d.n_chars, r.keep_bp
       FROM documents d JOIN rates r ON d.source = r.source
       WHERE ${h15Sql("concat('mix:', CAST(doc_id AS VARCHAR))")} % 10000 < r.keep_bp"""
  }

  /** Temperature-rebalanced mixture sample at alpha = 0.5 (the
    * standard tau=2 multilingual rebalancing: per-source budget share
    * proportional to sqrt(source size), so small sources are
    * UP-weighted relative to their share without any hand-set weight
    * list -- the mBERT/XLM-R exponent-smoothing recipe). alpha is
    * intentionally FIXED at 0.5: IEEE-754 mandates correctly-rounded
    * sqrt, so floor(sqrt(chars)) is bit-identical across engines,
    * while a general pow/exp/ln is not correctly-rounded and would
    * break the hash gate; other temperatures belong to the explicit
    * integer-weight [[mixtureSampleOf]]. Same BIGINT rate machinery,
    * broadcast per-source rate table, id-hash Bernoulli keep. */
  def temperatureMixtureOf(docs: DataFrame, budgetPct: Int): DataFrame = {
    val perSrc = DedupOps.materializeOnce(docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("chars_src"))
      .withColumn("w",
        greatest(lit(1L), floor(sqrt(col("chars_src"))).cast("long"))))
    val tot = perSrc.agg(sum(col("chars_src")).as("tot_chars"),
      sum(col("w")).as("tot_w"))
    val rates = perSrc.crossJoin(broadcast(tot)).select(
      col("source"),
      least(lit(10000L),
        expr(s"((tot_chars * $budgetPct DIV 100) * w DIV tot_w) " +
          "* 10000 DIV greatest(1, chars_src)")).as("keep_bp"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(h15(concat(lit("tmix:"), col("doc_id").cast("string"))),
        lit(10000)) < col("keep_bp"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("keep_bp"))
  }

  def temperatureMixture(s: SparkSession, dir: String): DataFrame =
    temperatureMixtureOf(Tables.documents(s, dir), MixtureBudgetPct)

  val temperatureMixtureSql: String =
    s"""WITH per AS (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars_src
         FROM documents GROUP BY 1),
       perw AS (
         SELECT source, chars_src,
           greatest(1, CAST(floor(sqrt(chars_src)) AS BIGINT)) AS w
         FROM per),
       tot AS (SELECT CAST(sum(chars_src) AS BIGINT) AS tot_chars,
                      CAST(sum(w) AS BIGINT) AS tot_w FROM perw),
       rates AS (
         SELECT source,
           least(10000, ((tot_chars * $MixtureBudgetPct // 100) * w // tot_w)
             * 10000 // greatest(1, chars_src)) AS keep_bp
         FROM perw CROSS JOIN tot)
       SELECT d.doc_id, d.source, d.n_chars, r.keep_bp
       FROM documents d JOIN rates r ON d.source = r.source
       WHERE ${h15Sql("concat('tmix:', CAST(doc_id AS VARCHAR))")} % 10000 < r.keep_bp"""

  /** Curriculum binning: assign each document a 0..9 difficulty decile
    * of a quality signal (here doc length) -- the ordering knob of
    * curriculum training schedules. Decile boundaries come from ONE
    * global aggregate broadcast as a single row; assignment is then a
    * narrow comparison pass (bin = #boundaries <= value), so no global
    * sort and no ntile window over one partition -- the plan that
    * kills this op at scale.
    *
    * `exact = false` (the production default) computes the boundaries
    * with `approx_percentile` -- a bounded KLL-style sketch, map-side
    * combinable, the only viable state shape when the boundary
    * aggregate spans 100 TB. `exact = true` exists for the oracle
    * gate: exact `percentile` keeps the hash cross-engine
    * reproducible, but its state is every value in one reducer --
    * same gate-vs-production split as a4/s15. Both variants share the
    * one-aggregate-broadcast plan shape. */
  def curriculumBinsOf(docs: DataFrame, exact: Boolean): DataFrame = {
    val deciles = (1 to 9).map(_ / 10.0)
    val pct =
      if (exact) s"percentile(n_chars, array(${deciles.mkString(",")}))"
      else s"approx_percentile(n_chars, array(${deciles.mkString(",")}), 10000)"
    val bounds = docs.agg(expr(pct).as("b"))
    docs.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_chars"),
        deciles.indices.map(i =>
            when(col("n_chars") >= col("b")(i), 1).otherwise(0))
          .reduce(_ + _).cast("int").as("bin"))
  }

  /** Production entry point: approx boundaries. */
  def curriculumBins(s: SparkSession, dir: String): DataFrame =
    curriculumBinsOf(Tables.documents(s, dir), exact = false)

  /** Oracle-gate twin: exact boundaries, hash-matched by the DuckDB
    * quantile_cont twin. */
  def curriculumBinsExact(s: SparkSession, dir: String): DataFrame =
    curriculumBinsOf(Tables.documents(s, dir), exact = true)

  val curriculumBinsSql: String = {
    val bins = (1 to 9)
      .map(i => s"(CASE WHEN n_chars >= q[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT quantile_cont(n_chars,
         [${(1 to 9).map(_ / 10.0).mkString(",")}]) AS q FROM documents)
       SELECT doc_id, n_chars, CAST($bins AS INT) AS bin
       FROM documents CROSS JOIN b"""
  }

  // ------------------------------------------------- per-source quota cap

  val SourceCapN = 50
  private[graft] val CapSalt = 8

  /** Cap every source at its top-N documents by a deterministic
    * priority (here: longest first, doc_id tie-break) -- the source
    * balancer that stops one crawl from dominating a training mix.
    *
    * Exact top-N-per-group, computed skew-proof in two bounded
    * stages: a salted window takes each (source, shard)'s local
    * top-N (a hot source's stream splits over [[CapSalt]] shards, so
    * no single task sorts the whole source), then the G*N finalists
    * per source -- a few hundred rows regardless of source size --
    * meet in the exact final window. Same cost model as a single
    * window on uniform data, bounded per-task work under any skew. */
  def sourceCapOf(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = Seq(col("n_chars").desc, col("doc_id").asc)
    // salt on a HASH of the id: pmod on the raw column would be NULL
    // for every row under a non-numeric id (string URLs through
    // Corpus.sourceCap), silently collapsing the "salted" window to
    // one shard per source -- exactly the hot-source skew this
    // two-stage shape exists to bound
    val local = Window
      .partitionBy(col("source"),
        pmod(xxhash64(col("doc_id").cast("string")), lit(CapSalt)))
      .orderBy(pri: _*)
    val fin = Window.partitionBy(col("source")).orderBy(pri: _*)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= n)
      .withColumn("rank_in_source", row_number().over(fin))
      .filter(col("rank_in_source") <= n)
      .drop("__lr")
  }

  def sourceCap(s: SparkSession, dir: String): DataFrame =
    sourceCapOf(Tables.documents(s, dir), SourceCapN)

  /** Per-source TOKEN budget for [[tokenCapOf]]. */
  val TokenCapBudget = 2000L

  /** Token-budget source cap: each source contributes its
    * deterministic-shuffle PREFIX of documents whose cumulative token
    * count fits `budget` -- the token-level twin of [[sourceCapOf]]
    * (which caps document COUNT): training mixes are specified in
    * tokens, and a source of long documents must not out-weigh one of
    * short documents just by doc count. Order is the salted content
    * hash of the id (uniform, re-run- and partition-stable -- the
    * same rand()-free permutation the samplers share); a document is
    * kept only if it fits WHOLLY (largest-prefix semantics, no doc
    * splitting -- chunk first via [[graft.ops.TextOps.chunkOf]] when
    * sub-document granularity is wanted).
    *
    * Scale shape: the per-source running token sum goes through
    * [[BoundedWindows.prefixSum]]'s bucket-offset decomposition --
    * sources are intrinsically low-cardinality, and a plain
    * per-source window would sort a whole crawl in one task. Exact
    * integer arithmetic throughout. */
  def tokenCapOf(docs: DataFrame, budget: Long): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
      h15(concat(lit("tc:"), col("doc_id").cast("string"))).as("__hr"))
    BoundedWindows.prefixSum(base, parts = Seq("source"), ord = "__hr",
      ties = Seq("doc_id"), value = col("n_tokens"), outCol = "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"))
  }

  def tokenCap(s: SparkSession, dir: String): DataFrame =
    tokenCapOf(Tables.documents(s, dir), TokenCapBudget)

  val tokenCapSql: String =
    s"""WITH s AS (
         SELECT doc_id, source,
           CAST(len(${graft.ops.TextOps.TokensSql}) AS BIGINT) AS n_tokens,
           ${Hashing.h15Sql("concat('tc:', CAST(doc_id AS VARCHAR))")} AS hr
         FROM documents),
       c AS (
         SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY source
             ORDER BY hr ASC, doc_id ASC) AS BIGINT) AS cum_tokens
         FROM s)
       SELECT doc_id, source, n_tokens, cum_tokens
       FROM c WHERE cum_tokens <= $TokenCapBudget"""

  val GroupSampleN = 40

  /** Exact uniform k-sample per group, deterministically: rank each
    * group's rows by the salted content-hash of the id (a uniform,
    * re-run- and partition-stable permutation -- the reservoir-sample
    * twin without rand()) and keep the first n. Same skew-proof
    * two-stage shape as [[sourceCapOf]]: salted shard-local top-n
    * windows bound per-task sort state under any group skew, then the
    * G x n finalists meet in the exact final window. */
  def groupSampleOf(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = docs.select(col("doc_id"), col("grp"),
      h15(concat(lit("gs:"), col("doc_id").cast("string"))).as("hrank"))
    val pri = Seq(col("hrank").asc, col("doc_id").asc)
    val local = Window
      .partitionBy(col("grp"),
        pmod(xxhash64(col("doc_id").cast("string")), lit(CapSalt)))
      .orderBy(pri: _*)
    val fin = Window.partitionBy(col("grp")).orderBy(pri: _*)
    ranked
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= n)
      .withColumn("rank_in_group", row_number().over(fin))
      .filter(col("rank_in_group") <= n)
      .drop("__lr", "hrank")
  }

  /** Table-bound twin: a uniform 40-doc sample per language. */
  def groupSample(s: SparkSession, dir: String): DataFrame =
    groupSampleOf(
      Tables.documents(s, dir).select(col("doc_id"), col("lang").as("grp")),
      GroupSampleN)

  val groupSampleSql: String =
    s"""SELECT doc_id, grp, CAST(rank_in_group AS INT) AS rank_in_group
       FROM (SELECT doc_id, lang AS grp,
                    row_number() OVER (PARTITION BY lang
                      ORDER BY ${Hashing.h15Sql("concat('gs:', CAST(doc_id AS VARCHAR))")} ASC,
                               doc_id ASC) AS rank_in_group
             FROM documents)
       WHERE rank_in_group <= $GroupSampleN"""

  val sourceCapSql: String =
    s"""SELECT doc_id, source, n_chars,
              CAST(rank_in_source AS INT) AS rank_in_source
       FROM (SELECT doc_id, source, n_chars,
                    row_number() OVER (PARTITION BY source
                      ORDER BY n_chars DESC, doc_id ASC) AS rank_in_source
             FROM documents)
       WHERE rank_in_source <= $SourceCapN"""

  val ShuffleBuckets = 16
  val ShardDocs = 64

  /** Deterministic global training-order shuffle + shard assignment --
    * the export "last mile": every surviving document gets an exact
    * 0-based position in a hash-pseudorandom permutation and the
    * shard file that position lands in, with NO global sort and NO
    * corpus-wide window.
    *
    * The permutation key is a salted content-hash of the id (re-run-
    * and partition-stable, oracle-reproducible -- the same argument
    * as every sampler above). Exact global ranks come from the
    * two-phase zipWithIndex shape, declaratively: the key's HIGH bits
    * pick one of `buckets` range buckets (bucket order == key order,
    * so bucket-local rank + the bucket's cumulative offset IS the
    * global rank); per-bucket counts are one map-side-combinable agg
    * whose `buckets`-row running total broadcasts back; the only
    * window partitions by bucket, so per-task sort state is
    * corpus/buckets -- grow `buckets` with the corpus and no task
    * ever holds more than a shard-sized slice. A single-partition
    * `row_number() OVER (ORDER BY ...)` -- the plan Spark would give
    * the naive formulation -- serializes the entire corpus through
    * one task; this shape is how the engine refuses it.
    *
    * Downstream, `shard` is the write partition: `.repartition($N,
    * col("shard"))` + partitionBy(shard) emits size-bounded training
    * shards whose contents and order are bit-reproducible across
    * re-runs, engines, and cluster sizes. */
  def shuffleShardOf(docs: DataFrame, buckets: Int = ShuffleBuckets,
      shardDocs: Int = ShardDocs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0 && shardDocs > 0, "buckets and shardDocs must be positive")
    // h15 is uniform on [0, 2^60): equal-width high-bit ranges are
    // equal-probability buckets, and bucket id is monotone in ord.
    val bucketWidth = (1L << 60) / buckets + (if ((1L << 60) % buckets == 0) 0 else 1)
    val keyed = docs
      .select(col("doc_id"),
        h15(concat(lit("shuf:"), col("doc_id").cast("string"))).as("ord"))
      .withColumn("bucket", expr(s"ord DIV $bucketWidth"))
    val offsets = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      // running offset over the buckets-row table (tiny by contract)
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    val w = Window.partitionBy(col("bucket")).orderBy(col("ord").asc, col("doc_id").asc)
    keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("global_pos", col("offset") + row_number().over(w) - 1)
      .select(col("doc_id"), col("ord"), col("global_pos"),
        expr(s"global_pos DIV $shardDocs").as("shard"),
        pmod(col("global_pos"), lit(shardDocs.toLong)).as("pos_in_shard"))
  }

  def shuffleShard(s: SparkSession, dir: String): DataFrame =
    shuffleShardOf(Tables.documents(s, dir))

  val shuffleShardSql: String = {
    val ord = h15Sql("concat('shuf:', CAST(doc_id AS VARCHAR))")
    s"""SELECT doc_id, ord,
              row_number() OVER (ORDER BY ord ASC, doc_id ASC) - 1 AS global_pos,
              (row_number() OVER (ORDER BY ord ASC, doc_id ASC) - 1) // $ShardDocs AS shard,
              (row_number() OVER (ORDER BY ord ASC, doc_id ASC) - 1) % $ShardDocs AS pos_in_shard
       FROM (SELECT doc_id, $ord AS ord FROM documents)"""
  }
}
