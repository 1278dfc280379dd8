package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the training-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) for the driver's correctness
  * gate -- each query paired with its DuckDB oracle SQL. */
object OpsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (TextOps.textStats _),
    "text_lang_id" -> (TextOps.langId _),
    "text_fingerprint" -> (TextOps.fingerprint _),
    "text_repetition" -> (TextOps.textRepetition _),
    "text_quality_gate" -> (TextOps.qualityGate _),
    "text_pii_scrub" -> (TextOps.piiScrub _),
    "dedup_exact" -> (DedupOps.dedupExact _),
    "dedup_minhash_lsh" -> (DedupOps.dedupMinhashLsh _),
    "dedup_simhash" -> (DedupOps.dedupSimhash _),
    "dedup_ngram_jaccard" -> (DedupOps.dedupNgramJaccard _),
    "dedup_embed_cosine" -> (DedupOps.dedupEmbedCosine _),
    "dedup_embed_lsh" -> (DedupOps.dedupEmbedLsh _),
    "dedup_containment" -> (DedupOps.dedupContainment _),
    "dedup_decontaminate" -> (DedupOps.dedupDecontaminate _),
    "dedup_clusters" -> (DedupOps.dedupClusters _),
    "sim_cosine_topk" -> (SimilarityOps.cosineTopK _),
    "sim_ann_signlsh" -> (SimilarityOps.annSignLsh _),
    "sim_ann_ivf" -> (SimilarityOps.annIvf _),
    "sim_ann_multiprobe" -> (SimilarityOps.annMultiProbe _),
    "mm_decode_features" -> (MultimodalOps.decodeFeatures _),
    "mm_resize_plan" -> (MultimodalOps.resizePlan _),
    "mm_sample_frames" -> (MultimodalOps.sampleFrames _),
    "p9_hash_sample" -> (SamplingOps.hashSample _),
    "p10_split_assign" -> (SamplingOps.splitAssign _),
    "p11_stratified_sample" -> (SamplingOps.stratifiedSample _),
    "agg_topk_sketch" -> (TextOps.topkTokensSketch _),
    "emb_quantize_int8" -> (SimilarityOps.embQuantizeInt8 _),
    "corpus_prepare" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.api.Corpus.prepare(graft.core.Tables.documents(s, dir),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))),
    "corpus_prepare_containment" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.api.Corpus.prepare(graft.core.Tables.documents(s, dir),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        containmentThreshold = Some(DedupOps.ContainmentThreshold))),
  )

  val oracleSql: Map[String, String] = Map(
    "text_stats" -> TextOps.textStatsSql,
    "text_lang_id" -> TextOps.langIdSql,
    "text_fingerprint" -> TextOps.fingerprintSql,
    "text_repetition" -> TextOps.textRepetitionSql,
    "text_quality_gate" -> TextOps.qualityGateSql,
    "text_pii_scrub" -> TextOps.piiScrubSql,
    "dedup_exact" -> DedupOps.dedupExactSql,
    "dedup_minhash_lsh" -> DedupOps.dedupMinhashLshSql,
    "dedup_simhash" -> DedupOps.dedupSimhashSql,
    "dedup_ngram_jaccard" -> DedupOps.dedupNgramJaccardSql,
    "dedup_embed_cosine" -> DedupOps.dedupEmbedCosineSql,
    "dedup_embed_lsh" -> DedupOps.dedupEmbedLshSql,
    "dedup_containment" -> DedupOps.dedupContainmentSql,
    "dedup_decontaminate" -> DedupOps.dedupDecontaminateSql,
    "dedup_clusters" -> DedupOps.dedupClustersSql,
    "sim_cosine_topk" -> SimilarityOps.cosineTopKSql,
    "sim_ann_signlsh" -> SimilarityOps.annSignLshSql,
    "sim_ann_ivf" -> SimilarityOps.annIvfSql,
    "sim_ann_multiprobe" -> SimilarityOps.annMultiProbeSql,
    "mm_decode_features" -> MultimodalOps.decodeFeaturesSql,
    "mm_resize_plan" -> MultimodalOps.resizePlanSql,
    "mm_sample_frames" -> MultimodalOps.sampleFramesSql,
    "p9_hash_sample" -> SamplingOps.hashSampleSql,
    "p10_split_assign" -> SamplingOps.splitAssignSql,
    "p11_stratified_sample" -> SamplingOps.stratifiedSampleSql,
    "agg_topk_sketch" -> TextOps.topkTokensSketchSql,
    "emb_quantize_int8" -> SimilarityOps.embQuantizeInt8Sql,
    "corpus_prepare" -> graft.api.Corpus.prepareSql,
    "corpus_prepare_containment" -> graft.api.Corpus.prepareContainmentSql,
  )
}
