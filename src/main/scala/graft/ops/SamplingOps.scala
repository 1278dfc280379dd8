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
}
