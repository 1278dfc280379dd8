package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** DataFrame-first similarity-search API over arbitrary id/vector
  * columns (the `graft.ops` query functions bind the same operators
  * to the test tables for the oracle gates).
  *
  * Vectors are `array` columns castable to double. Three search
  * tiers, increasing scale: exact brute force, sign-LSH buckets,
  * IVF centroid probing.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def prepared(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = asDouble(vec)
    df.select(id.as("vec_id"), v.as("v"),
      sqrt(SimilarityOps.dot(v, v)).as("nrm"))
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact cosine top-k of every query against the whole corpus:
    * (query_id, match_id, cosine, rank). The query side is broadcast;
    * keep it small relative to the corpus. */
  def cosineTopK(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int = 10): DataFrame = {
    val c = prepared(corpus, id, vec)
    val q = prepared(queries, qid, qvec)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    rank(c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** ANN via sign-LSH: probe only each query's hyperplane-sign
    * bucket, exact re-rank inside it. At scale, hash-partition the
    * corpus by bucket id so a probe reads one partition, and size
    * `planes` to the corpus (2^planes buckets) and `dims` to the
    * embedding width. */
  def annSignLsh(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int = 10,
      planes: Int = SimilarityOps.LshPlanes,
      dims: Int = SimilarityOps.PlaneDims): DataFrame = {
    val c = prepared(corpus, id, vec)
      .withColumn("bucket", SimilarityOps.signBucket(col("v"), planes, dims))
    val q = prepared(queries, qid, qvec)
      .withColumn("bucket", SimilarityOps.signBucket(col("v"), planes, dims))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    rank(broadcast(q).join(c, Seq("bucket"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** Multi-probe sign-LSH ANN: in addition to each query's own
    * bucket, probe the buckets reached by flipping its `extraProbes`
    * LOWEST-MARGIN hyperplane bits (the planes the query sits closest
    * to -- the standard multi-probe recall boost, ~(1+extraProbes)x
    * the candidate volume instead of 2^b buckets). Each corpus vector
    * lives in exactly one bucket, so probes never duplicate a
    * candidate pair and no DISTINCT is needed. */
  def annMultiProbe(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column,
      extraProbes: Int = 2, k: Int = 10,
      planes: Int = SimilarityOps.LshPlanes,
      dims: Int = SimilarityOps.PlaneDims): DataFrame = {
    val b = planes
    require(extraProbes >= 0 && extraProbes < b)
    val c = prepared(corpus, id, vec)
      .withColumn("bucket", SimilarityOps.signBucket(col("v"), planes, dims))
    val qm = prepared(queries, qid, qvec)
      .withColumn("margins", SimilarityOps.planeMargins(col("v"), planes, dims))
      .withColumn("bucket", SimilarityOps.bucketFromMargins(col("margins"), planes))
    // flip order: planes by (|margin| asc, plane idx asc); flipping
    // plane p toggles bit p of the bucket id
    val bitOf = (p: Column) => element_at(
      array((0 until b).map(i => lit(1L << i)): _*), p + 1)
    val order = array_sort(array((0 until b).map(p =>
      struct(abs(element_at(col("margins"), p + 1)).as("am"), lit(p).as("p"))): _*))
    val probes = array((col("bucket") +: (0 until extraProbes).map(i =>
      col("bucket").bitwiseXOR(bitOf(element_at(order, i + 1).getField("p"))))): _*)
    val q = qm.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(probes).as("bucket"))
    rank(broadcast(q).join(c, Seq("bucket"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** IVF-style ANN: `cell` assigns each corpus vector to a coarse-
    * quantizer cell; per-cell centroids are built from the corpus,
    * each query probes its `nprobe` nearest centroids and re-ranks
    * exactly inside the probed cells only. */
  def annIvf(corpus: DataFrame, id: Column, vec: Column, cell: Column,
      queries: DataFrame, qid: Column, qvec: Column,
      nprobe: Int = SimilarityOps.IvfNProbe, k: Int = 10): DataFrame = {
    val c = corpus.select(cell.as("label"), id.as("vec_id"), asDouble(vec).as("v"))
      .withColumn("nrm", sqrt(SimilarityOps.dot(col("v"), col("v"))))
    val cent = SimilarityOps.labelCentroids(c, col("label"), col("v"))
      .select(col("label").as("cell"), col("cv"), col("cn"))
    val q = prepared(queries, qid, qvec)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"),
        round(SimilarityOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cscore"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val probed = probes.withColumn("prank", row_number().over(pw))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    rank(broadcast(probed).join(c, probed("cell") === c("label"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** IVF-PQ with asymmetric distance computation (ADC) -- the
    * at-scale ANN composition (Jegou et al., PAMI'11): IVF cells
    * bound WHICH vectors are scored, PQ codes bound WHAT is read per
    * candidate (m small ints instead of 4*dims bytes), and queries
    * score candidates from a per-query 16-entry-per-subspace lookup
    * table -- the candidate's full-precision embedding is never
    * touched. Approximate cosine = ADC dot / (query norm *
    * reconstructed-codeword norm), both derivable from codes + LUT.
    *
    * Scale shape: at 100 TB the (cell, codes) table IS the index --
    * hash-partition it by cell and a query reads nprobe partitions
    * of m-byte codes. Here the corpus explodes ONCE into subvectors
    * feeding codebook and codes; LUT = queries x m x 16 rows rides a
    * broadcast; ADC scoring is one map-side-combinable sum of m rows
    * per (query, candidate). Determinism: LUT entries and codeword
    * norm terms are 1e-6-quantized longs (order-invariant sums); the
    * final cosine is one fixed-shape IEEE expression; ranks
    * tie-break on match_id. */
  def annIvfPq(corpus: DataFrame, id: Column, vec: Column, cell: Column,
      queries: DataFrame, qid: Column, qvec: Column,
      nprobe: Int = SimilarityOps.IvfNProbe, k: Int = 10,
      subspaces: Int = SimilarityOps.PqSubspaces,
      subDim: Int = SimilarityOps.PqSubDim): DataFrame = {
    val c = corpus.select(cell.as("label"), id.as("vec_id"), asDouble(vec).as("v"))
    val cent = SimilarityOps.labelCentroids(c, col("label"), col("v"))
      .select(col("label").as("cell"), col("cv"), col("cn"))
    val q = prepared(queries, qid, qvec)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    // coarse probes: byte-identical arithmetic to annIvf
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("cell"),
        round(SimilarityOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cscore"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val probed = probes.withColumn("prank", row_number().over(pw))
      .filter(col("prank") <= nprobe).select(col("query_id"), col("cell"))
    // PQ model: one subvector explode feeds codebook AND codes
    val sub = SimilarityOps.pqSubOf(
      c.select(col("vec_id"), col("v")), subspaces, subDim)
    val cb = SimilarityOps.pqCodebookOf(sub, subDim)
    val codes = SimilarityOps.pqAssign(sub, cb)
      .select(col("vec_id"), col("subspace"), col("code"))
    // per-query LUT (+ the codeword norm term riding the same row)
    val qsub = q.select(col("query_id"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("qv"))
      .select(col("query_id"), col("m").cast("int").as("subspace"),
        slice(col("qv"), col("m") * subDim + 1, lit(subDim)).as("qsv"))
    val lut = qsub.join(broadcast(cb), Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("cb_code").as("code"),
        round(SimilarityOps.dot(col("qsv"), col("cv")) * 1e6).cast("long").as("lutd"),
        round(SimilarityOps.dot(col("cv"), col("cv")) * 1e6).cast("long").as("nv"))
    // candidates from the probed cells, scored from codes alone
    val cand = broadcast(probed)
      .join(c.select(col("vec_id"), col("label")), probed("cell") === col("label"))
      .select(col("query_id"), col("vec_id"))
    val adc = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "subspace", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("lutd")).as("s"), sum(col("nv")).as("nv2"))
    val scored = adc
      .join(broadcast(q.select(col("query_id"), col("qn"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round((col("s") / 1e6) / (col("qn") * sqrt(col("nv2") / 1e6)), 6)
          .as("adc_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cosine").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Two-stage ANN: IVF-PQ ADC candidate generation ([[annIvfPq]] at
    * a `pool`-sized cut), then exact-cosine rerank of ONLY the pool
    * -- the production retrieval composition: codes prune the corpus,
    * full-precision vectors are fetched for pool x queries candidate
    * rows (a candidate-keyed equi join against the vector table,
    * never a corpus scan), and the final top-k ordering is exact
    * within the pool. Recall can only improve over raw ADC ranking:
    * ADC ordering error inside the pool is repaired for free. */
  def annIvfPqRerank(corpus: DataFrame, id: Column, vec: Column, cell: Column,
      queries: DataFrame, qid: Column, qvec: Column,
      nprobe: Int = SimilarityOps.IvfNProbe, k: Int = 10,
      pool: Int = SimilarityOps.RerankPool,
      subspaces: Int = SimilarityOps.PqSubspaces,
      subDim: Int = SimilarityOps.PqSubDim): DataFrame = {
    require(pool >= k, s"rerank pool $pool must cover the final top-$k")
    val cand = annIvfPq(corpus, id, vec, cell, queries, qid, qvec,
      nprobe, pool, subspaces, subDim)
      .select(col("query_id"), col("match_id"))
    val c = prepared(corpus, id, vec)
      .select(col("vec_id").as("match_id"), col("v"), col("nrm"))
    val q = prepared(queries, qid, qvec)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    rank(cand.join(c, Seq("match_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** Per-vector absmax int8 quantization: flat (vec_id, pos, q,
    * scale_r) rows, 4x smaller storage, dequant error <= scale/2. */
  def quantizeInt8(vectors: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = vectors.select(id.as("vec_id"), asDouble(vec).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127.0d)
    e.select(col("vec_id"), col("scale"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        round(col("x") / col("scale")).cast("int").as("q"),
        round(col("scale"), 9).as("scale_r"))
  }

  /** Product-quantization encode over arbitrary id/vector columns:
    * (vec_id, subspace, code, dist2) -- `subspaces` codes of
    * `log2(16)` bits replace 4*dims bytes per vector. Size
    * `subspaces`/`subDim` to the deployment (subspaces * subDim must
    * equal the embedding width). */
  def pqEncode(vectors: DataFrame, id: Column, vec: Column,
      subspaces: Int = graft.ops.SimilarityOps.PqSubspaces,
      subDim: Int = graft.ops.SimilarityOps.PqSubDim): DataFrame =
    graft.ops.SimilarityOps.pqEncodeOf(
      vectors.select(id.as("vec_id"), asDouble(vec).as("v")), subspaces, subDim)

  /** Persist an IVF index for a vector corpus into a warehouse store
    * -- the production form of [[annIvf]], which rebuilds the
    * quantizer per call. Two tables:
    * {{{
    *   {name}_cells      (cell, vec_id, v, nrm)  hive-partitioned BY CELL
    *   {name}_centroids  (cell, cv, cn)          the coarse quantizer
    * }}}
    * Storing the corpus clustered by cell is the at-rest
    * inverted-file layout: a query's probed cells resolve to
    * PARTITION DIRECTORIES, so [[queryIvfIndex]] scans only the
    * probed fraction of the index (dynamic partition pruning through
    * the broadcast probe join) instead of the corpus. Centroid
    * arithmetic is identical to [[annIvf]] (1e-6-quantized means), so
    * a fresh index answers queries exactly as the in-line operator
    * does. */
  def buildIvfIndex(store: graft.table.WarehouseWrites, name: String,
      corpus: DataFrame, id: Column, vec: Column, cell: Column): Unit = {
    // cell ids normalize to LONG so incremental maintenance
    // (followIvfIndex), whose argmax fold emits longs, unions and
    // merges against the stored index without a cast seam
    val c = corpus.select(cell.cast("long").as("cell"), id.as("vec_id"),
      asDouble(vec).as("v"))
      .withColumn("nrm", sqrt(SimilarityOps.dot(col("v"), col("v"))))
    val cent = SimilarityOps.labelCentroids(c, col("cell"), col("v"))
      .select(col("label").as("cell"), col("cv"), col("cn"))
    store.createOrReplace(c, s"${name}_cells", partitionBy = Seq("cell"))
    store.createOrReplace(cent, s"${name}_centroids", partitionBy = Nil)
  }

  /** ANN query against a persistent [[buildIvfIndex]] index: probe the
    * `nprobe` nearest centroids per query, scan ONLY those cells'
    * partitions of the stored corpus, re-rank exactly inside them.
    * Returns (query_id, match_id, cosine, rank). */
  def queryIvfIndex(store: graft.table.WarehouseWrites, name: String,
      queries: DataFrame, qid: Column, qvec: Column,
      nprobe: Int = SimilarityOps.IvfNProbe, k: Int = 10): DataFrame = {
    val cent = store.read(s"${name}_centroids")
    val q = prepared(queries, qid, qvec)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"),
        round(SimilarityOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cscore"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val probed = probes.withColumn("prank", row_number().over(pw))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val cells = store.read(s"${name}_cells")
    rank(broadcast(probed).join(cells, Seq("cell"))
      .select(col("query_id"), col("vec_id").as("match_id"),
        round(SimilarityOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine")), k)
  }

  /** k-NN majority-vote classification: each query takes the label
    * held by most of its k cosine-nearest corpus vectors. Ties break
    * deterministically: higher summed cosine of the voting neighbors
    * (summed as DECIMAL so accumulation order cannot flip a tie),
    * then smaller label. Returns (query_id, pred_label, votes,
    * score). The neighbor set is [[cosineTopK]]'s exact top-k; swap
    * in an ANN tier's candidates upstream for corpus scale -- the
    * voting shape is identical (the vote table is queries x k rows,
    * broadcast into the label join; the corpus is touched only by the
    * neighbor search itself). */
  def knnClassify(corpus: DataFrame, id: Column, vec: Column, label: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int = 15): DataFrame = {
    val nn = cosineTopK(corpus, id, vec, queries, qid, qvec, k)
    val labels = corpus.select(id.as("match_id"), label.as("nlabel"))
    val votes = labels.join(broadcast(nn), "match_id")
      .groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("votes"),
        sum(col("cosine").cast("decimal(18,6)")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("score").desc, col("nlabel").asc)
    votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("query_id"), col("nlabel").as("pred_label"),
        col("votes"), col("score").cast("double").as("score"))
  }

  /** Spherical k-means cell assignment over arbitrary columns -- the
    * self-contained coarse quantizer: feed its (vec_id, cell) output
    * straight into [[annIvf]]/[[buildIvfIndex]] as the `cell` column
    * when no natural label exists. Deterministic (hash init,
    * quantized means, smallest-cell tie-break); see
    * [[graft.ops.SimilarityOps.kmeansAssignOf]] for the scale shape
    * (per round: one broadcast one-row centroid list into a corpus
    * projection + one map-side-combinable mean -- zero corpus
    * shuffles). */
  def kmeans(vectors: DataFrame, id: Column, vec: Column,
      k: Int = SimilarityOps.KmeansK,
      iters: Int = SimilarityOps.KmeansIters): DataFrame =
    SimilarityOps.kmeansAssignOf(
      vectors.select(id.as("vec_id"), asDouble(vec).as("v")), k, iters)

  /** Fit PCA over a vector column: one distributed quantized-moment
    * scan ([[graft.functions.VecOuterSum]]) + a driver-side d x d
    * Jacobi solve. Deterministic under any partitioning. */
  def pcaFit(vectors: DataFrame, vec: Column,
      d: Int = SimilarityOps.Dim): SimilarityOps.PcaModel =
    SimilarityOps.pcaFit(vectors.select(vec.as("embedding")), d = d)

  /** Project onto a fitted model's top-k components -- a shuffle-free
    * codegen projection (weights ride as literals). */
  def pcaProject(vectors: DataFrame, id: Column, vec: Column,
      model: SimilarityOps.PcaModel, k: Int): DataFrame =
    SimilarityOps.pcaProjectOf(
      vectors.select(id.as("vec_id"), vec.as("embedding")), model, k)
}
