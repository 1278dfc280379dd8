package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Hashing._

/** Text-analysis operators over the `documents` table -- the
  * language-ID / quality-scoring / token-counting / fingerprinting
  * surface a training-data pipeline needs (SURVEY.md S7.6).
  *
  * Everything is a narrow per-row projection built from codegen'd
  * built-ins (split / transform / aggregate / regexp) -- no UDFs, no
  * shuffles, so the operators scan-scale linearly: at 100 TB these
  * run as a single WholeStageCodegen pass over the parquet scan with
  * only `text` read (column pruning).
  */
object TextOps {

  /** All tokens, multiplicity preserved (documents are single-space
    * separated, pre-cleaned -- FIXTURES.md). */
  def tokens(text: Column): Column = split(text, " ")

  val TokensSql = "string_split(text, ' ')"

  /** Marker stopwords per language for the n-gram/marker-count
    * language heuristic. Real pipelines load larger tables; the
    * mechanism (per-language marker scan + deterministic argmax) is
    * identical. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "que"),
  )

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  private def markerCountSql(markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($TokensSql, t -> t IN ($set)))"
  }

  /** Token counting + quality scoring: token/char counts, lexical
    * diversity, mean token length, stopword ratio -- the standard
    * cheap quality signals. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val sumLen = aggregate(transform(t, x => length(x)), lit(0L), (a, x) => a + x)
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("lang"),
      n.cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      round(size(array_distinct(t)).cast("double") / n, 4).as("lexical_diversity"),
      round(sumLen.cast("double") / n, 4).as("avg_token_len"),
      round(markerCount(t, LangMarkers.head._2).cast("double") / n, 4)
        .as("stopword_ratio"),
      // BPE-ish subword count estimate: runs of letters, digits, or
      // single other chars -- the standard cheap tokenizer proxy
      size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0)))
        .cast("long").as("n_bpeish_tokens"))
  }

  /** Character-class-only regex => identical semantics in Java regex
    * (Spark) and RE2 (DuckDB). */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  val textStatsSql: String =
    s"""SELECT doc_id, lang,
       CAST(len($TokensSql) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct($TokensSql)) AS BIGINT) AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(CAST(len(list_distinct($TokensSql)) AS DOUBLE) / len($TokensSql), 4) AS lexical_diversity,
       round(CAST(list_sum(list_transform($TokensSql, t -> length(t))) AS DOUBLE) / len($TokensSql), 4) AS avg_token_len,
       round(CAST(${markerCountSql(LangMarkers.head._2)} AS DOUBLE) / len($TokensSql), 4) AS stopword_ratio,
       CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS n_bpeish_tokens
       FROM documents"""

  /** Marker-based language ID: per-language marker occurrence counts
    * with a deterministic argmax (ties and all-zero fall through to
    * 'und'). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val scores = LangMarkers.map { case (l, ms) => l -> markerCount(t, ms) }
    val pred = scores.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      // first strictly-greatest marker count wins, seq order = priority
      val others = scores.filter(_._1 != l).map(_._2)
      when(others.foldLeft(sc > 0)((c, o) => c && sc > o), l).otherwise(acc)
    }
    Tables.documents(s, dir).select(
      (col("doc_id") +: scores.map { case (l, sc) => sc.cast("long").as(s"score_$l") }) :+
        pred.as("predicted_lang") :+ col("lang").as("actual_lang"): _*)
  }

  val langIdSql: String = {
    val scoreCols = LangMarkers.map { case (l, ms) =>
      s"CAST(${markerCountSql(ms)} AS BIGINT) AS score_$l"
    }.mkString(",\n       ")
    val pred = LangMarkers.reverse.foldLeft("'und'") { case (acc, (l, ms)) =>
      // mirror the Scala fold: later-evaluated (earlier in seq) wins
      val sc = markerCountSql(ms)
      val others = LangMarkers.filter(_._1 != l).map(o => s"$sc > ${markerCountSql(o._2)}")
      s"CASE WHEN $sc > 0 AND ${others.mkString(" AND ")} THEN '$l' ELSE $acc END"
    }
    s"""SELECT doc_id, $scoreCols,
       $pred AS predicted_lang, lang AS actual_lang
       FROM documents"""
  }

  /** Per-language heavy-hitter tokens via the SpaceSaving
    * TypedImperativeAggregate (graft.functions.TopKFreq). Capacity 64
    * >= the corpus vocabulary, so the sketch is exact here and the
    * oracle checks it against a count+rank derivation; at real scale
    * the same operator runs with bounded memory and an n/capacity
    * error bound. */
  def topkTokensSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKFreq.topkFreq
    Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .select(col("lang"), h31(col("tok")).as("h"))
      .groupBy(col("lang"))
      .agg(topkFreq(col("h"), k = 5, capacity = 64).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("idx", "entry")))
      .select(col("lang"), (col("idx") + 1).as("rank"),
        col("entry.item").as("token_hash"), col("entry.cnt").as("freq"))
  }

  val topkTokensSketchSql: String =
    s"""WITH tf AS (
         SELECT lang, ${h31Sql("tok")} AS token_hash, count(*) AS freq
         FROM (SELECT lang, unnest($TokensSql) AS tok FROM documents)
         GROUP BY 1, 2),
       r AS (SELECT lang, token_hash, freq,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY freq DESC, token_hash ASC) AS INT) AS rank
             FROM tf)
       SELECT lang, rank, token_hash, freq FROM r WHERE rank <= 5"""

  /** Document fingerprinting: whole-document md5 plus a winnowing-style
    * rolling fingerprint (min 60-bit hash over all 8-token windows --
    * robust to local edits, the building block of containment dedup). */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val windows = transform(sequence(lit(1), n - lit(7)),
      i => h15(array_join(slice(t, i, lit(8)), " ")))
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("md5_full"),
      when(n < 8, h15(col("text"))).otherwise(array_min(windows))
        .as("winnow_fp"))
  }

  val fingerprintSql: String =
    s"""SELECT doc_id, md5(text) AS md5_full,
       CASE WHEN len($TokensSql) < 8 THEN ${h15Sql("text")}
            ELSE list_min(list_transform(
                   generate_series(1, len($TokensSql) - 7),
                   i -> ${h15Sql(s"array_to_string(($TokensSql)[i:i+7], ' ')")}))
       END AS winnow_fp
       FROM documents"""
}
