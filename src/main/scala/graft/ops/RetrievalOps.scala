package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Hybrid retrieval: lexical (BM25) and dense (cosine) rankings fused
  * by Reciprocal Rank Fusion -- the standard two-tower retrieval
  * composition (RAG indexes, near-dup candidate mining, eval-set
  * retrieval) where neither signal alone suffices. RRF (Cormack et
  * al., SIGIR'09): score(d) = sum over systems of 1/(K + rank_sys(d)),
  * K = 60 -- rank-only fusion, so the two systems' incomparable score
  * scales never need calibration.
  *
  * Scale shape: the dense side is whatever ANN/exact tier the caller
  * picks (here the exact baseline -- swap in an IVF tier unchanged:
  * fusion reads only (query_id, match_id, rank)). The sparse side
  * streams the corpus-sized BM25 (doc, token) table ONCE through a
  * broadcast join with the tiny query-term list, aggregates
  * per-(query, doc) with a map-side-combinable integer sum, and
  * bounds per-task sort state with the salted two-stage top-k (the
  * [[SamplingOps.sourceCapOf]] shape) -- no window ever sees a
  * corpus-sized partition. Fusion itself joins two k-row-per-query
  * rankings -- constant-size work per query.
  *
  * Determinism: BM25 terms are pre-rounded to 1e-4 and summed as
  * scaled longs (order-invariant); ranks break ties on match_id; the
  * RRF sum is one fixed-shape IEEE expression over two small ints --
  * bit-identical across engines and partition counts.
  */
object RetrievalOps {

  /** RRF rank constant (the SIGIR'09 default). */
  val RrfK = 60

  /** Salt fan-out bounding the sparse top-k's per-task sort state. */
  val RrfSalt = 8

  /** Per-(query, doc) BM25 relevance: sum of the doc's BM25 weights
    * over the query's DISTINCT terms, as a 1e-4-scaled long. */
  private def sparseScores(bm25: DataFrame, queryTerms: DataFrame): DataFrame =
    bm25.join(broadcast(queryTerms), Seq("token"))
      .groupBy(col("query_id"), col("doc_id").as("match_id"))
      .agg(sum(round(col("bm25") * 1e4).cast("long")).as("s"))

  /** Exact per-query top-k of a scored (query_id, match_id, s) frame,
    * skew-proof: salted shard-local windows first, finalists meet in
    * the exact final window. */
  private def sparseTopK(scored: DataFrame, k: Int): DataFrame = {
    val pri = Seq(col("s").desc, col("match_id").asc)
    val local = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("match_id").cast("string")), lit(RrfSalt)))
      .orderBy(pri: _*)
    val fin = Window.partitionBy(col("query_id")).orderBy(pri: _*)
    scored.withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("sparse_rank", row_number().over(fin).cast("int"))
      .filter(col("sparse_rank") <= k)
      .select(col("query_id"), col("match_id"), col("sparse_rank"))
  }

  /** Fuse two (query_id, match_id, rank) rankings by RRF. Output one
    * row per fused candidate: (query_id, match_id, dense_rank,
    * sparse_rank, rrf, fused_rank), fused_rank <= k, ranks NULL on
    * the side that missed the candidate. */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, k: Int): DataFrame = {
    val d = dense.select(col("query_id"), col("match_id"),
      col("rank").cast("int").as("dense_rank"))
    val f = d.join(sparse, Seq("query_id", "match_id"), "full_outer")
    val term = (r: Column) =>
      coalesce(lit(1.0) / (lit(RrfK) + r), lit(0.0))
    val fused = f.select(col("query_id"), col("match_id"),
      col("dense_rank"), col("sparse_rank"),
      round(term(col("dense_rank")) + term(col("sparse_rank")), 9).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("match_id").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("int"))
      .filter(col("fused_rank") <= k)
  }

  /** Library surface: hybrid BM25 + dense-cosine retrieval over a
    * (docs, embeddings) pair sharing an id space. `queries` picks the
    * query docs; the dense tier is pluggable via `denseTopK` (any
    * frame with (query_id, match_id, rank) -- exact cosine, IVF,
    * sign-LSH). */
  def hybridRrf(docs: DataFrame, id: Column, text: Column,
      queryIds: DataFrame, denseTopK: DataFrame, k: Int): DataFrame = {
    val bm = graft.queries.AnalyticsQueries.bm25(
      docs.select(id.as("doc_id"), text.as("text")))
    val qt = docs.select(id.as("query_id"), text.as("text"))
      .join(queryIds.select(id.as("query_id")), Seq("query_id"), "left_semi")
      .select(col("query_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
    rrfFuse(denseTopK, sparseTopK(sparseScores(bm, qt), k), k)
  }

  /** Oracle entry: queries = docs 0..4 (the corpus' query slice, same
    * ids as the embedding query slice), dense = the exact cosine
    * baseline, k = 10. */
  def retHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    hybridRrf(docs, col("doc_id"), col("text"),
      docs.filter(col("doc_id") < SimilarityOps.NumQueries),
      SimilarityOps.cosineTopK(s, dir), SimilarityOps.TopK)
  }

  val retHybridRrfSql: String = {
    val k = SimilarityOps.TopK
    val nq = SimilarityOps.NumQueries
    s"""WITH dense AS (
         SELECT query_id, match_id, CAST(rank AS INT) AS dense_rank
         FROM (${SimilarityOps.cosineTopKSql}) dtk),
       bm AS (SELECT doc_id, token, bm25
              FROM (${graft.queries.AnalyticsQueries.textBm25Sql}) b),
       qt AS (SELECT doc_id AS query_id,
                unnest(list_distinct(${TextOps.TokensSql})) AS token
              FROM documents WHERE doc_id < $nq),
       sc AS (SELECT q.query_id, b.doc_id AS match_id,
                sum(CAST(round(b.bm25 * 1e4) AS BIGINT)) AS s
              FROM qt q JOIN bm b ON q.token = b.token GROUP BY 1, 2),
       sr AS (SELECT query_id, match_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY s DESC, match_id ASC) AS INT) AS sparse_rank
              FROM sc),
       sk AS (SELECT * FROM sr WHERE sparse_rank <= $k),
       f AS (SELECT coalesce(d.query_id, s.query_id) AS query_id,
               coalesce(d.match_id, s.match_id) AS match_id,
               d.dense_rank, s.sparse_rank
             FROM dense d FULL JOIN sk s
               ON d.query_id = s.query_id AND d.match_id = s.match_id),
       r AS (SELECT query_id, match_id, dense_rank, sparse_rank,
               round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + dense_rank), 0)
                 + coalesce(CAST(1 AS DOUBLE) / ($RrfK + sparse_rank), 0), 9)
                 AS rrf
             FROM f)
       SELECT query_id, match_id, dense_rank, sparse_rank, rrf,
         CAST(fr AS INT) AS fused_rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, match_id ASC) AS fr FROM r)
       WHERE fr <= $k"""
  }
}
