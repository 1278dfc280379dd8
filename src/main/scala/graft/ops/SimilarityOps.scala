package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Hashing._

/** Similarity search over the `embeddings` table (SURVEY.md S7.6).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force exact top-k -- the correctness
  *    baseline. Query set x corpus as a broadcast nested-loop of the
  *    (tiny) query side against a scan of the corpus; per-pair work
  *    is a sequential double fold, codegen-friendly, no UDF.
  *  - [[annSignLsh]]: the scale path. Random-hyperplane (sign) LSH:
  *    each vector is reduced to a b-bit bucket signature; search only
  *    probes the query's bucket, turning the n x m cross join into an
  *    equi-join on bucket id. Hyperplanes are +-1-valued and derived
  *    from the shared md5 hash family, so the oracle reproduces them
  *    exactly. At 100 TB the bucket id becomes the table's hash
  *    partition key, so a probe touches one partition, not the corpus.
  */
object SimilarityOps {

  /** Sequential left-to-right double dot product -- a native codegen
    * expression (graft.functions.ArrayExprs.DoubleDot) with the same
    * fold order as DuckDB's list_dot_product, so results are
    * bit-identical while staying inside WholeStageCodegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExprs.dot(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Per-label centroids of a vector frame: (label, cv, cn) where cv
    * is the per-position 1e-6-quantized exact mean (integer sums, so
    * engine- and partition-count-invariant) and cn its norm. This is
    * THE coarse quantizer -- annIvf, the persistent IVF index build,
    * and SemDeDup must score against byte-identical centroids, so
    * every surface calls this one helper instead of keeping copies in
    * sync by hand. */
  private[graft] def labelCentroids(vecs: DataFrame, label: Column,
      vec: Column): DataFrame =
    vecs.select(label.as("label"), vec.as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(round(col("x") * 1e6).cast("long")) /
        (count(lit(1)) * 1e6), 6).as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cv"))
      .select(col("label"), col("cv"),
        sqrt(dot(col("cv"), col("cv"))).as("cn"))

  val TopK = 10
  val NumQueries = 5

  /** Brute-force exact cosine top-k: query vectors (vec_id < 5)
    * against the whole corpus. Returns (query_id, match_id, cosine,
    * rank) with a deterministic (score desc, match_id) order. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.cosineTopK(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < NumQueries), col("vec_id"), col("embedding"), TopK)
  }

  val cosineTopKSql: String =
    s"""WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS match_id,
           round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
         FROM n q, n c WHERE q.vec_id < $NumQueries),
       ranked AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS INT) AS rank
         FROM scored)
       SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= $TopK"""

  /** Query split for the knn-classify gate: held-out vectors vs the
    * labeled rest. */
  val KnnQueries = 20
  val KnnK = 15

  /** k-NN majority-vote classification: vectors 0..19 held out as
    * unlabeled queries, classified by their 15 cosine-nearest labeled
    * neighbors (the embedding-space label-transfer op: tag new
    * documents with the cluster/topic/quality label of their
    * neighborhood). Deterministic tie-break: votes desc, DECIMAL
    * cosine mass desc, label asc. */
  def knnClassify(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.knnClassify(
      e.filter(col("vec_id") >= KnnQueries), col("vec_id"), col("embedding"),
      col("label"),
      e.filter(col("vec_id") < KnnQueries), col("vec_id"), col("embedding"),
      KnnK)
  }

  val knnClassifySql: String =
    s"""WITH e AS (
         SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS match_id, c.label,
           round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
         FROM n q, n c
         WHERE q.vec_id < $KnnQueries AND c.vec_id >= $KnnQueries),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS rank
         FROM scored),
       votes AS (
         SELECT query_id, label, count(*) AS votes,
                sum(CAST(cosine AS DECIMAL(18,6))) AS score
         FROM ranked WHERE rank <= $KnnK GROUP BY 1, 2),
       best AS (
         SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY votes DESC, score DESC, label ASC) AS rk
         FROM votes)
       SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes,
              CAST(score AS DOUBLE) AS score
       FROM best WHERE rk = 1"""

  // ------------------------------------------------------------- sign-LSH

  /** Default hyperplane count: 16 buckets, right for the test-scale
    * tables. At corpus scale pass a deployment-sized `planes` to the
    * parameterized entries below (recall/selectivity trade: each
    * extra plane halves the expected bucket occupancy). */
  val LshPlanes = 4

  /** Default embedding dimensionality (the driver's tables); plane
    * literals are generated to the `dims` each call site passes. */
  val PlaneDims = 64

  /** The +-1 hyperplane component for plane p, dimension j, derived
    * from the shared hash family (bit 0 of h15("plane:p:j")) --
    * computed driver-side and embedded as an array literal, so the
    * per-row work is one native dot product instead of `dims`
    * interpreted md5 calls per plane. */
  private def planeSigns(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map(j =>
      if ((h15Local(s"plane:$p:$j") & 1L) == 1L) 1.0 else -1.0)

  private def planeSignSql(p: Int): String =
    s"CASE WHEN ${h15Sql(s"concat('plane:$p:', CAST(j - 1 AS VARCHAR))")} & 1 = 1 THEN 1.0 ELSE -1.0 END"

  /** Per-plane margins (signed dot products with each +-1
    * hyperplane) as a length-`planes` array -- the quantity
    * multi-probe ordering needs. */
  def planeMargins(v: Column, planes: Int = LshPlanes,
      dims: Int = PlaneDims): Column =
    array((0 until planes).map { p =>
      graft.functions.ArrayExprs.dot(v, array(planeSigns(p, dims).map(lit): _*))
    }: _*)

  /** Bucket id from a margins array: bit p set iff margin p > 0. */
  def bucketFromMargins(margins: Column, planes: Int = LshPlanes): Column =
    (0 until planes).map { p =>
      when(element_at(margins, p + 1) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** b-bit sign-LSH bucket id of a double-array column: bit p set iff
    * the dot product with +-1 hyperplane p is positive. */
  def signBucket(v: Column, planes: Int = LshPlanes,
      dims: Int = PlaneDims): Column =
    (0 until planes).map { p =>
      val plane = array(planeSigns(p, dims).map(lit): _*)
      when(graft.functions.ArrayExprs.dot(v, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def signBucketSql(vExpr: String): String =
    (0 until LshPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(generate_series(1, len($vExpr)),
         j -> ($vExpr)[j] * ${planeSignSql(p)})) > 0
         THEN ${1L << p} ELSE 0 END"""
    }.mkString("(", " + ", ")")

  /** ANN via sign-LSH bucketing: probe only the query's bucket, exact
    * cosine re-rank within it. Approximate by construction (recall <
    * 1 vs [[cosineTopK]]); the oracle replicates the same buckets so
    * results still hash-match. */
  def annSignLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.annSignLsh(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < NumQueries), col("vec_id"), col("embedding"), TopK)
  }

  /** Extra buckets probed per query in multi-probe mode. */
  val MultiProbes = 2

  /** Multi-probe sign-LSH over `embeddings`: base bucket + flips of
    * the [[MultiProbes]] lowest-|margin| planes (see
    * [[graft.api.Similarity.annMultiProbe]]). Strictly higher recall
    * than [[annSignLsh]] at ~(1+MultiProbes)x candidate volume. */
  def annMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.annMultiProbe(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < NumQueries), col("vec_id"), col("embedding"),
      MultiProbes, TopK)
  }

  val annMultiProbeSql: String = {
    val marginSql = (p: Int) =>
      s"""list_sum(list_transform(generate_series(1, len(v)),
         j -> v[j] * ${planeSignSql(p)}))"""
    val margins = (0 until LshPlanes).map(marginSql).mkString("[", ", ", "]")
    val bucket = (0 until LshPlanes)
      .map(p => s"CASE WHEN margins[${p + 1}] > 0 THEN ${1L << p} ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       m AS (SELECT vec_id, v, nrm, $margins AS margins FROM n),
       b AS (SELECT vec_id, v, nrm, margins, $bucket AS bucket FROM m),
       qf AS (SELECT vec_id, bucket, margins FROM b WHERE vec_id < $NumQueries),
       flips AS (SELECT vec_id, bucket, p,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY abs(margins[p + 1]) ASC, p ASC) AS fr
         FROM qf, generate_series(0, ${LshPlanes - 1}) gs(p)),
       probes AS (
         SELECT vec_id, bucket AS probe FROM qf
         UNION ALL
         SELECT vec_id, xor(bucket, 1 << p) FROM flips WHERE fr <= $MultiProbes),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS match_id,
           round(list_dot_product(qb.v, c.v) / (qb.nrm * c.nrm), 6) AS cosine
         FROM probes q
         JOIN b qb ON q.vec_id = qb.vec_id
         JOIN b c ON q.probe = c.bucket),
       ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS INT) AS rank FROM scored)
       SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= $TopK"""
  }

  // ------------------------------------------------------------------ IVF

  /** Cells probed per query. */
  val IvfNProbe = 2

  /** IVF-style ANN: coarse-quantizer cells (per-label centroids, the
    * structure [[graft.queries.AnalyticsQueries.embCentroids]]
    * builds), probe the `IvfNProbe` nearest cells per query, exact
    * cosine re-rank inside the probed cells only.
    *
    * Scale shape: the centroid table is ncells x dim (tiny ->
    * broadcast twice: once for probe scoring, once to route queries);
    * the corpus is hash-partitioned by cell id, so a probe's search
    * join touches nprobe partitions per query instead of the corpus.
    * Centroid values are quantized exact sums (1e-6 longs), so both
    * engines derive identical cells, probes, and ranks. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.annIvf(e, col("vec_id"), col("embedding"), col("label"),
      e.filter(col("vec_id") < NumQueries), col("vec_id"), col("embedding"),
      IvfNProbe, TopK)
  }

  val annIvfSql: String =
    s"""WITH e AS (
         SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT label, vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       cp AS (SELECT label, i - 1 AS pos,
                round(sum(CAST(round(v[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
              FROM e, generate_series(1, 64) gs(i) GROUP BY 1, 2),
       cent AS (SELECT label AS cell, array_agg(c ORDER BY pos) AS cv FROM cp GROUP BY 1),
       cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
       q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
             WHERE vec_id < $NumQueries),
       probes AS (SELECT query_id, qv, qn, cell,
           round(list_dot_product(qv, cv) / (qn * cn), 6) AS cscore FROM q, cn),
       probed AS (SELECT query_id, qv, qn, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cscore DESC, cell ASC) AS prank FROM probes)
         WHERE prank <= $IvfNProbe),
       scored AS (SELECT p.query_id, c.vec_id AS match_id,
           round(list_dot_product(p.qv, c.v) / (p.qn * c.nrm), 6) AS cosine
         FROM probed p JOIN n c ON p.cell = c.label),
       ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS INT) AS rank FROM scored)
       SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= $TopK"""

  val KmeansK = 8
  val KmeansIters = 3

  /** Spherical k-means (Lloyd's) over a (vec_id, v: double[]) frame:
    * `iters` rounds of assign-to-max-cosine-centroid, then per-cell
    * quantized-mean update. Returns the final (vec_id, cell) -- the
    * self-contained coarse quantizer for [[annIvf]]/SemDeDup when no
    * seed label column exists.
    *
    * Deterministic across engines AND partition counts (what lets an
    * iterative clusterer sit under the hash gate): init cells come
    * from the shared md5 hash of the id (never rand()), means sum
    * 1e-6-quantized integers ([[labelCentroids]]), cosine is rounded
    * to 1e-6, and argmax ties keep the smallest cell.
    *
    * Scale shape: the k x dim centroid table collapses to ONE row
    * (collect_list) broadcast into a corpus-sized PROJECTION -- the
    * per-row argmax is a fold over k constant-size structs, so
    * assignment costs zero shuffles and no window; the mean update is
    * one map-side-combinable aggregate. Per round the corpus is
    * scanned, never reshuffled (Spark ML's KMeans makes the same
    * trade, driver-collecting its centroids). Cells may go empty
    * (standard Lloyd's); k caps the cell count. */
  def kmeansAssignOf(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val init = DedupOps.materializeOnce(
      vectors.select(col("vec_id"), col("v"),
        sqrt(dot(col("v"), col("v"))).as("nrm"),
        pmod(h15(col("vec_id").cast("string")), lit(k)).cast("long").as("cell")))
    var assigned = init
    var lastMat = init
    for (_ <- 1 to iters) {
      val m = DedupOps.materializeOnce(kmeansRound(assigned))
      DedupOps.releaseOnce(lastMat)
      assigned = m
      lastMat = m
    }
    assigned.select(col("vec_id"), col("cell"))
  }

  /** One Lloyd round: per-cell centroids of the incoming assignment,
    * then re-assign every vector to its max-cosine centroid. The
    * round IS the scale claim, so it is factored out for the plan
    * spec: the centroid table collapses to ONE broadcast row and the
    * argmax is a per-row fold -- no window, no corpus shuffle. */
  /** Max-cosine cell over a one-row `cents` array column -- the
    * argmax fold shared by the Lloyd round and fixed-centroid
    * assignment ([[assignToCentroids]]).
    *
    * Seed score strictly BELOW the -2.0 null-coalesce floor: a
    * zero-norm vector scores -2.0 against every cell, and -2.0 must
    * BEAT the seed so the fold lands on the first (smallest) cell --
    * a seed AT -2.0 would tie, keep the sentinel, and emit cell -1.
    * Explicit zero-norm guard, not NULL-coalescing: ANSI mode (the
    * Spark 4 default) throws DIVIDE_BY_ZERO where legacy yielded NULL
    * and DuckDB yields NaN/inf -- the CASE floor is the one
    * formulation all engines agree on; the outer coalesce routes a
    * NULL input vector to the floor too instead of leaving the fold
    * stuck on the seed's -1 sentinel. */
  private[graft] def bestCellExpr(centsCol: Column): Column = {
    val seed = struct(lit(-3.0).as("score"), lit(-1L).as("cell"))
    aggregate(centsCol, seed, (acc, c) => {
      val sc = coalesce(
        when(col("nrm") === 0.0 || c.getField("cn") === 0.0, lit(-2.0))
          .otherwise(
            round(dot(col("v"), c.getField("cv")) / (col("nrm") * c.getField("cn")), 6)),
        lit(-2.0))
      when(sc > acc.getField("score"),
        struct(sc.as("score"), c.getField("cell").as("cell"))).otherwise(acc)
    }).getField("cell")
  }

  private[graft] def kmeansRound(assigned: DataFrame): DataFrame = {
    // one row holding every live centroid, cell-ascending so the
    // strict-> fold keeps the SMALLEST cell on score ties
    val cents = labelCentroids(assigned, col("cell"), col("v"))
      .agg(sort_array(collect_list(
        struct(col("label").as("cell"), col("cv"), col("cn")))).as("cents"))
    assigned.drop("cell").crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"),
        bestCellExpr(col("cents")).as("cell"))
  }

  /** Assign rows of a (vec_id, v, nrm) frame to their max-cosine cell
    * from a FIXED (cell, cv, cn) centroid table -- the standard IVF
    * maintenance contract (centroids change only on rebuild). One
    * broadcast centroid row into a narrow per-row fold; ties and
    * degenerate norms resolve exactly as in the Lloyd round. */
  private[graft] def assignToCentroids(frame: DataFrame,
      centroids: DataFrame): DataFrame = {
    val cents = centroids
      .agg(sort_array(collect_list(
        struct(col("cell").cast("long").as("cell"), col("cv"), col("cn"))))
        .as("cents"))
    frame.crossJoin(broadcast(cents))
      .withColumn("cell", bestCellExpr(col("cents")))
      .drop("cents")
  }

  /** Table-bound twin over `embeddings`. */
  def embKmeans(s: SparkSession, dir: String): DataFrame =
    kmeansAssignOf(
      Tables.embeddings(s, dir).repartition(32)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      KmeansK, KmeansIters)

  /** [[annIvf]] with its coarse cells DERIVED by [[kmeansAssignOf]]
    * instead of the table's label column -- the hash-gated proof of
    * the composition claim (kmeans output IS a valid `cell` input;
    * no seed label needed anywhere). Same probe/re-rank machinery. */
  def annIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    val cells = kmeansAssignOf(
      e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      KmeansK, KmeansIters)
    val corpus = e.join(cells, "vec_id")
    graft.api.Similarity.annIvf(corpus, col("vec_id"), col("embedding"),
      col("cell"), e.filter(col("vec_id") < NumQueries),
      col("vec_id"), col("embedding"), IvfNProbe, TopK)
  }

  /** The `KmeansIters` rounds unrolled as chained CTEs (shared by the
    * emb_kmeans oracle and the kmeans->IVF composition oracle);
    * DuckDB's row_number argmax with the same coalesce(-2.0) +
    * cell-asc tie-break. */
  private def kmeansCtes: String = {
    def roundSql(prev: String, t: Int): String =
      s"""c${t}p AS (SELECT cell, CAST(i - 1 AS INT) AS pos,
           round(sum(CAST(round(v[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
         FROM $prev, generate_series(1, 64) gs(i) GROUP BY 1, 2),
       c$t AS (SELECT cell, list(c ORDER BY pos) AS cv FROM c${t}p GROUP BY 1),
       c${t}n AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM c$t),
       a$t AS (SELECT vec_id, v, nrm, cell FROM (
           SELECT a.vec_id, a.v, a.nrm, c.cell,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               CASE WHEN a.nrm = 0 OR c.cn = 0 THEN -2.0
                    ELSE round(list_dot_product(a.v, c.cv) / (a.nrm * c.cn), 6)
               END DESC, c.cell ASC) AS rn
           FROM $prev a CROSS JOIN c${t}n c) WHERE rn = 1)"""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       a0 AS (SELECT vec_id, v, nrm,
                CAST(${Hashing.h15Sql("CAST(vec_id AS VARCHAR)")} % $KmeansK AS BIGINT) AS cell
              FROM n),
       ${(1 to KmeansIters).map(t => roundSql(s"a${t - 1}", t)).mkString(",\n")}"""
  }

  val embKmeansSql: String =
    s"""$kmeansCtes
       SELECT vec_id, cell FROM a$KmeansIters"""

  /** Composition oracle: the kmeans chain's final assignment becomes
    * the IVF label set, then the standard probe/re-rank (identical to
    * [[annIvfSql]] with `label` = the learned cell). */
  val annIvfKmeansSql: String =
    s"""$kmeansCtes,
       kn AS (SELECT a.cell AS label, a.vec_id, a.v, a.nrm FROM a$KmeansIters a),
       cp AS (SELECT label, i - 1 AS pos,
                round(sum(CAST(round(v[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
              FROM kn, generate_series(1, 64) gs(i) GROUP BY 1, 2),
       cent AS (SELECT label AS cell2, array_agg(c ORDER BY pos) AS cv FROM cp GROUP BY 1),
       cn2 AS (SELECT cell2, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
       q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
             WHERE vec_id < $NumQueries),
       probes AS (SELECT query_id, qv, qn, cell2,
           round(list_dot_product(qv, cv) / (qn * cn), 6) AS cscore FROM q, cn2),
       probed AS (SELECT query_id, qv, qn, cell2 FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cscore DESC, cell2 ASC) AS prank FROM probes)
         WHERE prank <= $IvfNProbe),
       scored AS (SELECT p.query_id, c.vec_id AS match_id,
           round(list_dot_product(p.qv, c.v) / (p.qn * c.nrm), 6) AS cosine
         FROM probed p JOIN kn c ON p.cell2 = c.label),
       ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS INT) AS rank FROM scored)
       SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= $TopK"""

  /** Int8 vector quantization (per-vector absmax scaling) -- the
    * storage-compression step of a large vector index (4x smaller
    * than float32). Flat (vec_id, pos, q) output; scale rounded for
    * cross-engine exactness. Dequantization error <= scale/2. */
  def embQuantizeInt8(s: SparkSession, dir: String): DataFrame =
    graft.api.Similarity.quantizeInt8(Tables.embeddings(s, dir),
      col("vec_id"), col("embedding"))

  val embQuantizeInt8Sql: String =
    """WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       sc AS (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e)
       SELECT vec_id, CAST(i - 1 AS INT) AS pos,
         CAST(round(v[i] / scale) AS INT) AS q,
         round(scale, 9) AS scale_r
       FROM sc, generate_series(1, 64) gs(i)"""

  // ------------------------------------------- product quantization

  val PqSubspaces = 4
  val PqSubDim = 16

  /** Product-quantization encode: split each vector into `m`
    * contiguous `subDim`-wide subvectors, build one codebook per
    * subspace, and emit each subvector's nearest code -- the
    * compression step of an IVF-PQ index (m bytes per vector instead
    * of 4*dims). Codebooks here are one deterministic Lloyd step:
    * initial cells from the axis-sign pattern of the subvector's
    * first 4 elements (an axis-aligned LSH -- cross-engine exact,
    * unlike k-means++), centroids as 1e-6-quantized means, then every
    * subvector re-assigned to its NEAREST centroid. Production would
    * iterate Lloyd further; the plan shape is what scales:
    *
    * Scale shape: subspace explode is narrow (m rows per vector); the
    * codebook agg is map-side combinable into m * 2^4 tiny rows; the
    * encode pass joins the BROADCAST codebook and argmins 16
    * centroids per subvector -- one shuffle-free scan over the
    * corpus after the codebook agg. Distances via the native
    * sequential dot (bit-identical to DuckDB's list_dot_product).
    * Input: (vec_id, v double[]). Output: (vec_id, subspace, code,
    * dist2). */
  def pqEncodeOf(vectors: DataFrame, m: Int = PqSubspaces,
      subDim: Int = PqSubDim): DataFrame = {
    val sub = pqSubOf(vectors, m, subDim)
    pqAssign(sub, pqCodebookOf(sub, subDim))
  }

  /** Subspace split: (vec_id, subspace, sv) -- m narrow rows per
    * vector, the shared first stage of PQ encode and ADC scoring. */
  private[graft] def pqSubOf(vectors: DataFrame, m: Int,
      subDim: Int): DataFrame =
    vectors
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("subspace"),
        col("v"))
      .select(col("vec_id"), col("subspace").cast("int").as("subspace"),
        slice(col("v"), col("subspace") * subDim + 1, lit(subDim)).as("sv"))

  /** Per-subspace codebook (subspace, cb_code, cv) from a subvector
    * stream: axis-sign init cells, one quantized-mean Lloyd step --
    * m * 2^4 tiny rows from one map-side-combinable aggregate. */
  private[graft] def pqCodebookOf(sub: DataFrame, subDim: Int): DataFrame = {
    val initBits = math.min(4, subDim)
    val code0 = (0 until initBits).map(j =>
      when(element_at(col("sv"), j + 1) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _).cast("int")
    sub.withColumn("code", code0)
      .select(col("subspace"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("subspace"), col("code"), col("pos"))
      .agg(round(sum(round(col("x") * 1e6).cast("long")) /
        (count(lit(1)) * lit(1e6)), 6).as("c"))
      .groupBy(col("subspace"), col("code").as("cb_code"))
      .agg(sort_array(collect_list(struct(col("pos"), col("c"))))
        .getField("c").as("cv"))
  }

  /** Nearest-codeword assignment: (vec_id, subspace, code, dist2). */
  private[graft] def pqAssign(sub: DataFrame, codebook: DataFrame): DataFrame = {
    // |a-b|^2 as dot(a,a) - 2 dot(a,b) + dot(b,b): every term is the
    // proven-bit-identical sequential dot, so the argmin agrees with
    // the oracle exactly
    val d = dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("cv")) +
      dot(col("cv"), col("cv"))
    sub.join(broadcast(codebook), Seq("subspace"))
      .groupBy(col("vec_id"), col("subspace"))
      .agg(min(struct(d.as("d"), col("cb_code").as("code"))).as("best"))
      .select(col("vec_id"), col("subspace"),
        col("best.code").as("code"), round(col("best.d"), 6).as("dist2"))
  }

  def embPqEncode(s: SparkSession, dir: String): DataFrame =
    pqEncodeOf(Tables.embeddings(s, dir).repartition(32)
      .select(col("vec_id"), asDouble(col("embedding")).as("v")))

  val embPqEncodeSql: String = {
    val sd = PqSubDim
    val initSql = (0 until 4)
      .map(j => s"(CASE WHEN sv[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       sub AS (
         SELECT vec_id, CAST(m AS INT) AS subspace,
           list_transform(generate_series(1, $sd), j -> v[m * $sd + j]) AS sv
         FROM e, generate_series(0, ${PqSubspaces - 1}) gs(m)),
       init AS (SELECT *, CAST($initSql AS INT) AS code FROM sub),
       cbp AS (
         SELECT subspace, code, i - 1 AS pos,
           round(sum(CAST(round(sv[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
         FROM init, generate_series(1, $sd) gs(i) GROUP BY 1, 2, 3),
       cb AS (SELECT subspace, code AS cb_code, array_agg(c ORDER BY pos) AS cv
              FROM cbp GROUP BY 1, 2),
       scored AS (
         SELECT s.vec_id, s.subspace, cb.cb_code,
           list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv)
             + list_dot_product(cb.cv, cb.cv) AS d
         FROM sub s JOIN cb ON s.subspace = cb.subspace)
       SELECT vec_id, subspace, cb_code AS code, round(d, 6) AS dist2
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
               ORDER BY d, cb_code) AS rn FROM scored)
       WHERE rn = 1"""
  }

  // ------------------------------------------------------------ IVF-PQ

  /** IVF-PQ with asymmetric distance computation (ADC) -- the
    * at-scale ANN composition (Jegou et al., PAMI'11): coarse IVF
    * cells bound WHICH vectors are scored, PQ codes bound WHAT is
    * read per vector (m bytes instead of 4*dims), and the query side
    * scores candidates without ever touching the original embeddings
    * -- per query a 2^4-entry lookup table per subspace (LUT) is
    * computed against the full-precision query vector, and each
    * candidate's approximate dot product is the sum of its m code
    * lookups. The approximate cosine divides by the RECONSTRUCTED
    * vector norm (norm of the candidate's concatenated codewords),
    * derivable from the codes alone.
    *
    * Scale shape: at 100 TB the (codes, cell) table IS the index --
    * narrow (id, m small ints), hash-partitioned by cell; a query
    * reads nprobe partitions of m-byte codes, not embeddings. Here
    * the corpus explodes ONCE into subvectors feeding codebook and
    * codes; LUT = queries x m x 16 rows rides a broadcast; scoring is
    * one map-side-combinable sum over m rows per (query, candidate).
    * The full-precision corpus is touched only by the (index-build)
    * encode pass, exactly as a deployed IVF-PQ index would.
    *
    * Determinism: LUT entries and codeword norm terms are
    * 1e-6-quantized longs, so the per-candidate sums are
    * order-invariant; the final cosine is one fixed-shape IEEE
    * expression over exact longs; ranks tie-break on match_id. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.annIvfPq(e, col("vec_id"), col("embedding"), col("label"),
      e.filter(col("vec_id") < NumQueries), col("vec_id"), col("embedding"),
      IvfNProbe, TopK)
  }

  val annIvfPqSql: String = annIvfPqSqlK(TopK)

  /** [[annIvfPqSql]] at an arbitrary cut `k` -- the rerank oracle
    * nests the pool-sized variant as its candidate CTE. */
  def annIvfPqSqlK(k: Int): String = {
    val sd = PqSubDim
    val m = PqSubspaces
    val initSql = (0 until 4)
      .map(j => s"(CASE WHEN sv[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (
         SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       n AS (SELECT label, vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       cp AS (SELECT label, i - 1 AS pos,
                round(sum(CAST(round(v[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
              FROM e, generate_series(1, 64) gs(i) GROUP BY 1, 2),
       cent AS (SELECT label AS cell, array_agg(c ORDER BY pos) AS cv FROM cp GROUP BY 1),
       cn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
       q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
             WHERE vec_id < $NumQueries),
       probes AS (SELECT query_id, cell,
           round(list_dot_product(qv, cv) / (qn * cn), 6) AS cscore FROM q, cn),
       probed AS (SELECT query_id, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cscore DESC, cell ASC) AS prank FROM probes)
         WHERE prank <= $IvfNProbe),
       sub AS (
         SELECT vec_id, CAST(m AS INT) AS subspace,
           list_transform(generate_series(1, $sd), j -> v[m * $sd + j]) AS sv
         FROM e, generate_series(0, ${m - 1}) gs(m)),
       init AS (SELECT *, CAST($initSql AS INT) AS code FROM sub),
       cbp AS (
         SELECT subspace, code, i - 1 AS pos,
           round(sum(CAST(round(sv[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
         FROM init, generate_series(1, $sd) gs(i) GROUP BY 1, 2, 3),
       cb AS (SELECT subspace, code AS cb_code, array_agg(c ORDER BY pos) AS cv
              FROM cbp GROUP BY 1, 2),
       pqs AS (
         SELECT s.vec_id, s.subspace, cb.cb_code,
           list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv)
             + list_dot_product(cb.cv, cb.cv) AS d
         FROM sub s JOIN cb ON s.subspace = cb.subspace),
       codes AS (
         SELECT vec_id, subspace, cb_code AS code
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                 ORDER BY d, cb_code) AS rn FROM pqs)
         WHERE rn = 1),
       qsub AS (
         SELECT query_id, CAST(m AS INT) AS subspace,
           list_transform(generate_series(1, $sd), j -> qv[m * $sd + j]) AS qsv
         FROM q, generate_series(0, ${m - 1}) gs(m)),
       lut AS (
         SELECT query_id, qs.subspace, cb.cb_code AS code,
           CAST(round(list_dot_product(qsv, cb.cv) * 1e6) AS BIGINT) AS lutd,
           CAST(round(list_dot_product(cb.cv, cb.cv) * 1e6) AS BIGINT) AS nv
         FROM qsub qs JOIN cb ON qs.subspace = cb.subspace),
       cand AS (SELECT p.query_id, nn.vec_id
                FROM probed p JOIN n nn ON p.cell = nn.label),
       adc AS (
         SELECT c.query_id, c.vec_id AS match_id,
           sum(l.lutd) AS s, sum(l.nv) AS nv2
         FROM cand c
         JOIN codes k ON c.vec_id = k.vec_id
         JOIN lut l ON l.query_id = c.query_id
           AND l.subspace = k.subspace AND l.code = k.code
         GROUP BY 1, 2),
       sc AS (
         SELECT a.query_id, a.match_id,
           round((s / 1e6) / (qq.qn * sqrt(nv2 / 1e6)), 6) AS adc_cosine
         FROM adc a JOIN q qq ON a.query_id = qq.query_id)
       SELECT query_id, match_id, adc_cosine, CAST(rr AS INT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY adc_cosine DESC, match_id ASC) AS rr FROM sc)
       WHERE rr <= $k"""
  }

  /** Candidate pool the rerank tier re-scores exactly: wide enough
    * that ADC ordering errors inside the pool cannot cost recall,
    * small enough that full-precision vectors are fetched for a
    * constant number of candidates per query. */
  val RerankPool = 30

  /** Two-stage retrieval at its production shape: IVF-PQ ADC prunes
    * the corpus to [[RerankPool]] candidates per query from codes
    * alone, then ONLY those candidates' full-precision vectors are
    * fetched and exact-cosine re-ranked to the final top-k -- the
    * standard ADC-then-rerank composition. At 100 TB the rerank join
    * touches pool x queries rows of the corpus (candidate-keyed equi
    * join against the vector table), never the corpus itself. */
  def annIvfPqRerank(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).repartition(32)
    graft.api.Similarity.annIvfPqRerank(e, col("vec_id"), col("embedding"),
      col("label"), e.filter(col("vec_id") < NumQueries), col("vec_id"),
      col("embedding"), IvfNProbe, TopK, RerankPool)
  }

  val annIvfPqRerankSql: String =
    s"""WITH n2 AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             CAST(embedding AS DOUBLE[]))) AS nrm
         FROM embeddings),
       cand AS (SELECT query_id, match_id FROM (${annIvfPqSqlK(RerankPool)})),
       ex AS (
         SELECT c.query_id, c.match_id,
           round(list_dot_product(qv.v, cv.v) / (qv.nrm * cv.nrm), 6) AS cosine
         FROM cand c
         JOIN n2 qv ON qv.vec_id = c.query_id
         JOIN n2 cv ON cv.vec_id = c.match_id)
       SELECT query_id, match_id, cosine, CAST(rr AS INT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, match_id ASC) AS rr FROM ex)
       WHERE rr <= $TopK"""

  val annSignLshSql: String =
    s"""WITH e AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
               ${signBucketSql("v")} AS bucket FROM e),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS match_id,
           round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
         FROM b q JOIN b c ON q.bucket = c.bucket
         WHERE q.vec_id < $NumQueries),
       ranked AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, match_id ASC) AS INT) AS rank
         FROM scored)
       SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= $TopK"""

  /** Recall@k instrumentation for the ANN ladder: every approximate
    * tier's top-k joined against the EXACT [[cosineTopK]] top-k on
    * the same queries -- one (tier, hits, recall) row per tier, the
    * measured target any nprobe/band/plane tuning needs. Exact top-k
    * is computed once (materialized; it is 50 rows) and semi-joins
    * each tier's result; the tiers themselves run their production
    * plans unchanged. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = DedupOps.materializeOnce(
      cosineTopK(s, dir).select(col("query_id"), col("match_id")))
    val denom = NumQueries * TopK
    Seq(
      "ivf" -> annIvf(s, dir),
      "ivf_kmeans" -> annIvfKmeans(s, dir),
      "ivfpq" -> annIvfPq(s, dir),
      "ivfpq_rr" -> annIvfPqRerank(s, dir),
      "multiprobe" -> annMultiProbe(s, dir),
      "signlsh" -> annSignLsh(s, dir)).map { case (name, approx) =>
      approx.select(col("query_id"), col("match_id"))
        .join(exact, Seq("query_id", "match_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("tier"),
          lit(denom.toLong).as("n_exact"),
          col("hits"),
          round(col("hits") / lit(denom.toDouble), 4).as("recall_at_k"))
    }.reduce(_ unionByName _)
  }

  /** Each tier's full oracle SQL rides as a nested-WITH subquery; the
    * recall arithmetic on top mirrors the engine exactly. */
  val annRecallSql: String = {
    def tierSql(name: String, sql: String): String =
      s"""SELECT '$name' AS tier,
         CAST(${NumQueries * TopK} AS BIGINT) AS n_exact,
         (SELECT CAST(count(*) AS BIGINT) FROM ($sql) a
          WHERE EXISTS (SELECT 1 FROM exact x
            WHERE x.query_id = a.query_id AND x.match_id = a.match_id)) AS hits,
         round((SELECT count(*) FROM ($sql) a2
          WHERE EXISTS (SELECT 1 FROM exact x
            WHERE x.query_id = a2.query_id AND x.match_id = a2.match_id))
           / ${(NumQueries * TopK).toDouble}, 4) AS recall_at_k"""
    s"""WITH exact AS (SELECT query_id, match_id FROM ($cosineTopKSql) ex)
       ${tierSql("ivf", annIvfSql)}
       UNION ALL ${tierSql("ivf_kmeans", annIvfKmeansSql)}
       UNION ALL ${tierSql("ivfpq", annIvfPqSql)}
       UNION ALL ${tierSql("ivfpq_rr", annIvfPqRerankSql)}
       UNION ALL ${tierSql("multiprobe", annMultiProbeSql)}
       UNION ALL ${tierSql("signlsh", annSignLshSql)}"""
  }

  // ------------------------------------------------------- silhouette

  /** Clustering-quality report: simplified (centroid-based)
    * silhouette per cluster over the kmeans assignment. For each
    * vector, a = cosine distance to its OWN centroid, b = distance to
    * the nearest OTHER centroid, s = (b - a) / max(a, b) -- the
    * k-selection / cluster-health metric, computed the way silhouette
    * is actually run at scale: against the k centroids (k * n
    * distances, one broadcast row of centroids into a per-row fold),
    * never the O(n^2) pairwise original.
    *
    * Scale shape: the assignment is [[kmeansAssignOf]] (per round one
    * broadcast centroid row, zero corpus shuffles); the silhouette
    * pass adds ONE more centroid aggregate and one narrow fold
    * projection, then a k-row output aggregate. Determinism: sims
    * round at 6 like every cosine here, the per-cluster mean runs on
    * 1e-6-quantized integer sums. */
  def silhouetteOf(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val assigned = kmeansAssignOf(vectors, k, iters)
    val frame = vectors.join(assigned, "vec_id")
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = labelCentroids(frame, col("cell"), col("v"))
      .agg(sort_array(collect_list(
        struct(col("label").as("cell"), col("cv"), col("cn")))).as("cents"))
    // one fold over the k-struct array per row: own-centroid sim and
    // best other-centroid sim in a single pass, the kmeansRound
    // guard discipline (CASE floor for degenerate norms, ANSI-safe)
    val seed = struct(lit(-9.0).as("so"), lit(-9.0).as("sb"))
    val folded = aggregate(col("cents"), seed, (acc, c) => {
      val sc = coalesce(
        when(col("nrm") === 0.0 || c.getField("cn") === 0.0, lit(-2.0))
          .otherwise(round(
            dot(col("v"), c.getField("cv")) / (col("nrm") * c.getField("cn")),
            6)),
        lit(-2.0))
      struct(
        when(c.getField("cell") === col("cell"), sc)
          .otherwise(acc.getField("so")).as("so"),
        when(c.getField("cell") =!= col("cell"),
          greatest(acc.getField("sb"), sc))
          .otherwise(acc.getField("sb")).as("sb"))
    })
    val withS = frame.crossJoin(broadcast(cents))
      .withColumn("__f", folded)
      .withColumn("__a", lit(1.0) - col("__f.so"))
      // a single non-empty cluster has no "other" centroid: its
      // members' silhouette is 0 by convention (b = a)
      .withColumn("__b", when(col("__f.sb") === -9.0, col("__a"))
        .otherwise(lit(1.0) - col("__f.sb")))
      .withColumn("sil",
        when(greatest(col("__a"), col("__b")) <= 0.0, lit(0.0))
          .otherwise(round((col("__b") - col("__a")) /
            greatest(col("__a"), col("__b")), 6)))
    withS.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("sil") * 1e6).cast("long")) /
          (count(lit(1)) * 1e6), 6).as("avg_sil"))
  }

  /** Table-bound twin over the embeddings corpus at the kmeans
    * defaults. */
  def embClusterSilhouette(s: SparkSession, dir: String): DataFrame =
    silhouetteOf(
      Tables.embeddings(s, dir).repartition(32)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      KmeansK, KmeansIters)

  val embClusterSilhouetteSql: String = {
    val last = s"a$KmeansIters"
    s"""$kmeansCtes,
       fcp AS (SELECT cell, CAST(i - 1 AS INT) AS pos,
           round(sum(CAST(round(v[i] * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS c
         FROM $last, generate_series(1, 64) gs(i) GROUP BY 1, 2),
       fc AS (SELECT cell, list(c ORDER BY pos) AS cv FROM fcp GROUP BY 1),
       fcn AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM fc),
       sims AS (SELECT a.vec_id, a.cell AS own, c.cell AS cand,
           CASE WHEN a.nrm = 0 OR c.cn = 0 THEN -2.0
                ELSE round(list_dot_product(a.v, c.cv) / (a.nrm * c.cn), 6)
           END AS sim
         FROM $last a CROSS JOIN fcn c),
       ab AS (SELECT vec_id, own,
           max(CASE WHEN cand = own THEN sim END) AS sim_own,
           max(CASE WHEN cand <> own THEN sim END) AS sim_other
         FROM sims GROUP BY 1, 2),
       sv AS (SELECT vec_id, own, (1.0 - sim_own) AS a,
           CASE WHEN sim_other IS NULL THEN (1.0 - sim_own)
                ELSE (1.0 - sim_other) END AS b
         FROM ab),
       sil AS (SELECT vec_id, own,
           CASE WHEN greatest(a, b) <= 0 THEN 0.0
                ELSE round((b - a) / greatest(a, b), 6) END AS sil
         FROM sv)
       SELECT CAST(own AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n,
         round(sum(CAST(round(sil * 1e6) AS BIGINT)) / (count(*) * 1e6), 6)
           AS avg_sil
       FROM sil GROUP BY 1"""
  }

  // -------------------------------------------------------------- PCA

  /** Embedding dimensionality of the driver's corpus. */
  val Dim = 64

  /** Principal components of an embedding corpus.
    *
    * `mean` and `components` (rows = components, descending
    * eigenvalue) are in input units; `eigenvalues` are the component
    * variances; their sum equals the covariance trace (total
    * variance), which is what explained-variance ratios divide by. */
  final case class PcaModel(n: Long, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def totalVariance: Double = {
      // trace ordering fixed (dim order) for determinism
      var t = 0.0; var i = 0
      while (i < eigenvalues.length) { t += eigenvalues(i); i += 1 }
      t
    }
    def explained(k: Int): Array[Double] =
      eigenvalues.take(k).map(_ / totalVariance)
  }

  /** Fit PCA in ONE distributed pass + a driver-side d x d eigen
    * solve -- the scale split that makes PCA a scan problem: the
    * corpus contributes only [[graft.functions.VecOuterSum]]'s
    * quantized moment buffer (d^2 longs, map-side combinable,
    * partition-order exact), and the O(d^3) Jacobi diagonalization
    * runs on the driver where d = 64 is trivial. No row ever leaves
    * its task; at 100 TB this is one narrow scan.
    *
    * Determinism: the moment sums are exact integers, the covariance
    * doubles derive from them in fixed order, and cyclic Jacobi with
    * a fixed sweep order + sign convention (largest-|loading|
    * coordinate positive) yields one canonical model for a given
    * corpus regardless of partitioning. */
  def pcaFit(emb: DataFrame, vecCol: String = "embedding",
      d: Int = Dim): PcaModel = {
    val r = emb.agg(graft.functions.VecOuterSum.agg(col(vecCol), d).as("m"))
      .head().getStruct(0)
    pcaFitFromMoments(r.getLong(0), r.getSeq[Long](1).toArray,
      r.getSeq[Long](2).toArray, d)
  }

  /** The driver-side half of [[pcaFit]], split out so callers that
    * already hold the moment buffer (e.g. the oracle gate, which
    * also needs the raw trace) fit without a second scan. */
  private[ops] def pcaFitFromMoments(n: Long, sums: Array[Long],
      prods: Array[Long], d: Int): PcaModel = {
    require(n >= 2, s"PCA needs >= 2 vectors, saw $n")
    val q = graft.functions.VecOuterSum.Quantum
    val nD = n.toDouble
    val mean = sums.map(_.toDouble / nD / q)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (prods(t).toDouble -
          sums(i).toDouble * sums(j).toDouble / nD) / (nD - 1.0) / (q * q)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEig(cov)
    PcaModel(n, mean, vecs, vals)
  }

  /** Cyclic Jacobi diagonalization of a symmetric matrix: rotations
    * in fixed (p, q) order until the off-diagonal mass is below
    * tolerance. Returns (eigenvalues desc, eigenvectors as rows,
    * sign-fixed so each vector's largest-|entry| coordinate is
    * positive). Classic textbook routine (Golub & Van Loan 8.5),
    * O(d^3) driver-side -- fine for embedding dims. */
  private[ops] def jacobiEig(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-22) {
      var p = 0
      while (p < d - 1) {
        var qq = p + 1
        while (qq < d) {
          val apq = a(p)(qq)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(qq)(qq) - a(p)(p)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(qq)
              a(k)(p) = c * akp - s * akq
              a(k)(qq) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(qq)(k)
              a(p)(k) = c * apk - s * aqk
              a(qq)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(qq)
              v(k)(p) = c * vkp - s * vkq
              v(k)(qq) = s * vkp + c * vkq
              k += 1
            }
          }
          qq += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // sign convention: the largest-|loading| coordinate positive
      // (first index wins ties) -- otherwise the eigenvector sign is
      // an artifact of rotation order
      var best = 0; var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** Project each vector onto the model's top-k components -- a
    * narrow, shuffle-free codegen projection (component weights are
    * broadcast as literals; each output is one zip_with/aggregate
    * fold over the row's own array). */
  def pcaProjectOf(emb: DataFrame, model: PcaModel, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val meanArr = array(model.mean.map(lit).toIndexedSeq: _*)
    val centered = zip_with(col(vecCol), meanArr,
      (x, m) => x.cast("double") - m)
    val pcs = (0 until k).map { j =>
      val w = array(model.components(j).map(lit).toIndexedSeq: _*)
      round(aggregate(zip_with(centered, w, (c, wi) => c * wi),
        lit(0.0), (acc, e) => acc + e), 6).as(s"pc${j + 1}")
    }
    emb.select((col(idCol) +: pcs): _*)
  }

  /** Whitened projection: each component additionally scaled by
    * 1/sqrt(eigenvalue), so the output coordinates have unit sample
    * variance -- the decorrelation preprocessing PQ codebooks and
    * distance metrics assume. Components with (near-)zero variance
    * are zeroed rather than amplified: dividing by a vanishing
    * eigenvalue would blow quantization noise up to full scale. Same
    * shuffle-free projection plan as [[pcaProjectOf]]. */
  def pcaWhitenOf(emb: DataFrame, model: PcaModel, k: Int,
      eps: Double = 1e-9, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scaled = model.copy(components = model.components.zipWithIndex.map {
      case (row, j) =>
        val ev = model.eigenvalues(j)
        if (ev <= eps) row.map(_ => 0.0)
        else row.map(_ / math.sqrt(ev))
    })
    pcaProjectOf(emb, scaled, k, idCol, vecCol)
  }

  /** Oracle-gated covariance surface: the exact quantized-integer
    * covariance entries the PCA fit diagonalizes, exploded to one row
    * per upper-triangle (i, j) -- 1-based to match SQL array
    * indexing. The heavy lifting is the SAME one-pass aggregate;
    * expanding d(d+1)/2 driver-side rows is model-sized work. */
  def embPcaCov(s: SparkSession, dir: String): DataFrame = {
    val d = Dim
    val r = Tables.embeddings(s, dir)
      .agg(graft.functions.VecOuterSum.agg(col("embedding"), d).as("m"))
      .head().getStruct(0)
    val n = r.getLong(0)
    val sums = r.getSeq[Long](1).toArray
    val prods = r.getSeq[Long](2).toArray
    // the gate hashes the EXACT integer numerator n*sp - si*sj (the
    // covariance times n(n-1)q^2), never a rounded double: both
    // engines compute it in exact BIGINT arithmetic, so there is no
    // rounding-boundary flakiness to split on (decimal-string vs
    // binary round() differ at 0.5-ulp boundaries). Bound: with
    // |q| <= ~1e3 units the numerator stays under 2^63 past 1e9
    // rows; multiplyExact fails loud, not wrapped, beyond that.
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val t = i * d - i * (i - 1) / 2 + (j - i)
      val num = Math.subtractExact(Math.multiplyExact(n, prods(t)),
        Math.multiplyExact(sums(i), sums(j)))
      (i + 1, j + 1, n, num)
    }
    import s.implicits._
    rows.toDF("i", "j", "n", "cov_num")
  }

  val embPcaCovSql: String =
    """WITH q AS (SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         FROM embeddings),
       idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
       pairs AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b WHERE b.i >= a.i),
       s AS (SELECT i, j,
               CAST(sum(qv[i] * qv[j]) AS BIGINT) AS sp,
               CAST(sum(qv[i]) AS BIGINT) AS si,
               CAST(sum(qv[j]) AS BIGINT) AS sj,
               CAST(count(*) AS BIGINT) AS n
             FROM q, pairs GROUP BY 1, 2)
       SELECT i, j, n, CAST(n * sp - si * sj AS BIGINT) AS cov_num
       FROM s"""

  /** Table-bound projection: top-4 principal components of the
    * embeddings corpus. This is the PRODUCTION operator Bench
    * measures; the oracle entry is [[embPcaProjectGate]] (the eigen
    * solve is not SQL-expressible, so the driver-checked gate pins
    * the projection's invariants instead of its raw values). */
  def embPcaProject(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    pcaProjectOf(emb, pcaFit(emb), k = 4)
  }

  /** Tolerance-band oracle gate for [[embPcaProject]] (the
    * a4_percentiles_approx pattern: Spark computes real invariant
    * booleans, the DuckDB oracle pins them TRUE, so a broken eigen
    * solve or projection flips the hash red). Per component j:
    *
    *  - `var_in_band`: the sample variance of pc_j equals the model's
    *    j-th eigenvalue within a 2% relative band. The residual is
    *    real but bounded: the fit diagonalizes the 1e-3-quantized
    *    covariance while the projection runs over raw floats, so the
    *    two variances differ by O(quantum * sigma) cross terms --
    *    orders below any eigen-solve bug.
    *  - `mean_near_zero`: |mean(pc_j)| <= 1e-2 (projections of
    *    mean-centered data; the bound is the quantized-mean offset
    *    |((raw_mean - model_mean) . w)| <= quantum/2 * sqrt(d)).
    *  - `ortho_ok`: |corr(pc_j, pc_i)| <= 0.02 for every i != j --
    *    distinct principal directions decorrelate.
    *  - `order_ok`: eigenvalue_j >= eigenvalue_{j+1} >= 0 and the
    *    eigenvalue sum over ALL d components equals the covariance
    *    trace within 1e-9 relative (Jacobi preserves the trace; this
    *    anchors the solve to the integer-exact moment pass that
    *    [[embPcaCov]] hash-gates).
    *
    * Two distributed passes (the fit's moment scan, reused for the
    * trace anchor, plus one over the projections): the 6-dp-rounded
    * projections cast exactly to DECIMAL(18,6), and all moments
    * (sums, squares, cross products) are EXACT decimal sums, so the
    * booleans cannot flicker with partitioning; the band checks are
    * driver arithmetic over a model-sized row. */
  def embPcaProjectGate(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val mr = emb.agg(graft.functions.VecOuterSum.agg(
      col("embedding"), Dim).as("m")).head().getStruct(0)
    val mN = mr.getLong(0)
    val mSums = mr.getSeq[Long](1).toArray
    val mProds = mr.getSeq[Long](2).toArray
    val model = pcaFitFromMoments(mN, mSums, mProds, Dim)
    val k = 4
    val proj = pcaProjectOf(emb, model, k)
    val dec = (j: Int) => col(s"pc$j").cast("decimal(18,6)")
    val moments =
      (1 to k).map(j => sum(dec(j)).cast("decimal(38,6)").as(s"s$j")) ++
      (1 to k).flatMap(i => (i to k).map(j =>
        sum(dec(i) * dec(j)).cast("decimal(38,12)").as(s"sp${i}_$j")))
    val r = proj.agg(count(lit(1)).as("n"), moments: _*).head()
    val n = r.getLong(0)
    val nD = n.toDouble
    val sm = (1 to k).map(j =>
      r.getDecimal(r.fieldIndex(s"s$j")).doubleValue()).toArray
    def sp(i: Int, j: Int): Double =
      r.getDecimal(r.fieldIndex(s"sp${i}_$j")).doubleValue()
    def covOf(i: Int, j: Int): Double =
      (sp(i, j) - sm(i - 1) * sm(j - 1) / nD) / (nD - 1.0)
    val ev = model.eigenvalues
    val trace = {
      // exact-integer covariance trace, same arithmetic as pcaFit
      var t = 0.0; var i = 0
      while (i < Dim) { t += ev(i); i += 1 }
      t
    }
    val intTrace = {
      val q = graft.functions.VecOuterSum.Quantum
      (0 until Dim).map { i =>
        val t = i * Dim - i * (i - 1) / 2
        (mProds(t).toDouble - mSums(i).toDouble * mSums(i).toDouble / mN) /
          (mN - 1.0) / (q * q)
      }.sum
    }
    val orderOk = (0 until k).forall(j =>
      ev(j) >= (if (j + 1 < Dim) ev(j + 1) else 0.0) && ev(j) >= 0.0) &&
      math.abs(trace - intTrace) <= 1e-9 * math.max(intTrace, 1e-12)
    import s.implicits._
    (1 to k).map { j =>
      val v = covOf(j, j)
      val varOk = ev(j - 1) > 0.0 && math.abs(v / ev(j - 1) - 1.0) <= 0.02
      val meanOk = math.abs(sm(j - 1) / nD) <= 1e-2
      val orthoOk = (1 to k).filter(_ != j).forall { i =>
        val (lo, hi) = (math.min(i, j), math.max(i, j))
        val denom = math.sqrt(covOf(i, i) * covOf(j, j))
        denom > 0.0 && math.abs(covOf(lo, hi) / denom) <= 0.02
      }
      (j, n, varOk, meanOk, orthoOk, orderOk)
    }.toDF("component", "n", "var_in_band", "mean_near_zero",
      "ortho_ok", "order_ok")
  }

  val embPcaProjectGateSql: String =
    """SELECT CAST(i AS INT) AS component,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n,
       TRUE AS var_in_band, TRUE AS mean_near_zero,
       TRUE AS ortho_ok, TRUE AS order_ok
       FROM generate_series(1, 4) g(i)"""
}
