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

  /** Unicode-NORMALIZED tokenizer, the opt-in twin of [[tokens]] for
    * non-toy text: NFKC + ROOT lowercase (one codegen'd native pass,
    * [[graft.functions.NormText]]), CJK ideographs/kana/hangul split
    * to single-char tokens (the standard no-dictionary CJK
    * segmentation), then tokens = maximal letter/digit runs
    * (punctuation-aware split; apostrophes split like other
    * punctuation). Near-dup fingerprints built on these catch pairs
    * that differ only in case, punctuation, or encoding form --
    * which space-split fingerprints miss ([[normTokensSqlOn]]
    * documents the oracle-side reproduction and its NFKC caveat). */
  def normTokens(text: Column): Column = {
    val spaced = regexp_replace(graft.functions.NormText.nfkcLower(text),
      "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}])", " $1 ")
    filter(split(spaced, "[^\\p{L}\\p{N}]+"), t => t =!= "")
  }

  /** DuckDB twin of [[normTokens]] over column expression `c`. Exact
    * on every input whose NFKC form is itself (all of ASCII and most
    * NFC text) -- DuckDB has no NFKC function, so compatibility
    * variants (fullwidth forms, ligatures) normalize on the Spark
    * side only; the Spark-side semantics are pinned by spec instead
    * ([[graft.functions]] NormTextSpec). */
  def normTokensSqlOn(c: String): String =
    raw"""list_filter(string_split_regex(regexp_replace(lower($c),
         '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])', ' \1 ', 'g'),
         '[^\pL\pN]+'), t -> t <> '')""".linesIterator.map(_.trim).mkString(" ")

  val NormTokensSql: String = normTokensSqlOn("text")

  /** Space-joined [[normTokens]] -- the COLUMN-LEVEL normalization
    * adapter: every token-keyed operator in the library tokenizes on
    * single spaces, and normalized tokens contain none, so passing
    * `normalizeText(text)` where an operator takes its text column
    * runs that operator on normalized tokens with no signature
    * change (shingles, fingerprints, LM scores, BM25, chunking
    * alike). A doc whose tokens ALL normalize away (pure
    * punctuation) becomes the empty string, which downstream
    * space-split sees as one empty token -- same behavior those
    * operators already have for empty raw text. */
  def normalizeText(text: Column): Column = array_join(normTokens(text), " ")

  def normalizeTextSqlOn(c: String): String =
    s"array_to_string(${normTokensSqlOn(c)}, ' ')"

  /** Normalization preview op: raw vs normalized token counts plus
    * the normalized text, per document. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val nt = normTokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens_raw"),
      size(nt).cast("long").as("n_tokens_norm"),
      array_join(nt, " ").as("text_norm"))
  }

  val textNormalizeSql: String =
    s"""SELECT doc_id,
       CAST(len($TokensSql) AS BIGINT) AS n_tokens_raw,
       CAST(len($NormTokensSql) AS BIGINT) AS n_tokens_norm,
       array_to_string($NormTokensSql, ' ') AS text_norm
       FROM documents"""

  /** GZIP round-trip over the compressed-text ingest path: every
    * document's text -> [[graft.functions.GzipText]] compress (real
    * RFC 1952 frames) -> decompress, then byte length and the h15
    * content hash of the ROUND-TRIPPED text. DEFLATE is lossless, so
    * the DuckDB
    * oracle computes both features from the PLAIN text alone — a hash
    * match proves decompress(compress(text)) == text for the whole
    * corpus without the oracle seeing a gzip byte (the GIF/WAV gating
    * trick applied to the dominant 100 TB modality). Both directions
    * are native expressions inside whole-stage codegen; the op is
    * embarrassingly per-row. */
  def textGzipRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val rt = graft.functions.GzipText.gunzipText(
      graft.functions.GzipText.gzipText(col("text")))
    Tables.documents(s, dir).select(
      col("doc_id"),
      octet_length(rt).cast("long").as("n_bytes_rt"),
      Hashing.h15(rt).as("text_h"))
  }

  val textGzipRoundtripSql: String =
    s"""SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_rt,
       ${Hashing.h15Sql("text")} AS text_h
       FROM documents"""

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

  /** Character-distribution Shannon entropy per document (nats) --
    * the classic gibberish detector: natural text sits in a narrow
    * entropy band, while base64 blobs / key dumps / single-char spam
    * fall far outside it, so a band filter on this column is a
    * standard pretraining quality gate.
    *
    * Entirely within-row via the native
    * [[graft.functions.CharEntropy]] expression (one codepoint pass
    * into a charset-bounded count table, inside WholeStageCodegen) --
    * no explode, no shuffle, O(len) per row. The HOF formulation this
    * replaced (split -> per-distinct-char filter fold) measured
    * ~2 us/char at every sweep scale, the whole cost of the op.
    * Per-char log terms are quantized to 1e-6 integers
    * ([[LogpQuantum]]) and summed as exact integers, so the per-doc
    * sum is order-invariant and the cross-engine hash matches the
    * oracle's per-distinct-char formulation term for term. */
  def charEntropyOf(docs: DataFrame): DataFrame = {
    val st = graft.functions.CharEntropy.stats(col("text"))
    docs.select(
      col("doc_id"),
      st.getField("n_chars").as("n_chars"),
      st.getField("n_charset").as("n_charset"),
      round(st.getField("sum_u").cast("double") /
        (st.getField("n_chars").cast("double") * LogpQuantum), 4)
        .as("char_entropy"))
  }

  def charEntropy(s: SparkSession, dir: String): DataFrame =
    charEntropyOf(Tables.documents(s, dir))

  val charEntropySql: String =
    """WITH c AS (
         SELECT doc_id, string_split(text, '') AS chars,
                CAST(length(text) AS BIGINT) AS n
         FROM documents),
       u AS (
         SELECT doc_id, n, chars,
           list_transform(list_distinct(chars),
             d -> CAST(len(list_filter(chars, ch -> ch = d)) AS BIGINT)) AS counts
         FROM c)
       SELECT doc_id, n AS n_chars,
         CAST(len(list_distinct(chars)) AS BIGINT) AS n_charset,
         round(CAST(list_sum(list_transform(counts,
             cnt -> cnt * CAST(round(ln(CAST(n AS DOUBLE) / cnt) * 1000000, 0)
                             AS BIGINT))) AS DOUBLE)
           / (n * 1000000.0), 4) AS char_entropy
       FROM u"""

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

  // ------------------------------------------- repetition + quality gate

  /** Quality-gate thresholds (Gopher-style repetition/length rules,
    * tuned to discriminate on the synthetic corpus: each rule fails a
    * real fraction of docs). */
  val QualityMinTokens = 25L
  val QualityMinDiversity = 0.35
  val QualityMaxTopTokenFrac = 0.15
  val QualityMaxDup3gramFrac = 0.2

  /** Highest single-token frequency, computed per-row with NO shuffle:
    * sort the token array, then one fold tracking the current and best
    * run length (equal tokens are adjacent after the sort). The
    * explode+groupBy(doc, token) formulation would shuffle every token
    * occurrence twice; this stays inside the projection, which is the
    * shape that scan-scales at 100 TB. */
  private def topTokenFreq(t: Column): Column =
    aggregate(
      array_sort(t),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** DuckDB twin: per-distinct-token occurrence count, max. O(d*n) vs
    * the Scala fold's O(n log n) -- same value, and the oracle only
    * runs at small scale. */
  private val topTokenFreqSql: String =
    s"list_max(list_transform(list_distinct($TokensSql), " +
      s"d -> len(list_filter($TokensSql, x -> x = d))))"

  /** Count of DISTINCT k-token shingles (31-bit-hashed, same hash as
    * the dedup shingle machinery). */
  private def shingleDistinct(t: Column, k: Int): Column =
    size(graft.functions.HashExprs.md5ShingleSet(t, k))

  private def shingleDistinctSql(k: Int): String =
    s"len(list_distinct(list_transform(" +
      s"generate_series(1, greatest(len($TokensSql) - ${k - 1}, 1)), " +
      s"i -> ${h31Sql(s"array_to_string(($TokensSql)[i:i+${k - 1}], ' ')")})))"

  /** Duplicate-shingle fraction: 1 - distinct/total k-gram windows --
    * the Gopher "duplicate n-gram" repetition signal. */
  private def fracDupKgram(t: Column, n: Column, k: Int): Column = {
    val w = greatest(n - lit(k - 1), lit(1)).cast("double")
    round((w - shingleDistinct(t, k).cast("double")) / w, 4)
  }

  private def fracDupKgramSql(k: Int): String = {
    val w = s"CAST(greatest(len($TokensSql) - ${k - 1}, 1) AS DOUBLE)"
    s"round(($w - CAST(${shingleDistinctSql(k)} AS DOUBLE)) / $w, 4)"
  }

  /** Repetition metrics per doc: top-token frequency/fraction and
    * duplicate 2-/3-gram fractions. All per-row projections -- no
    * shuffle, scan-scales. DataFrame-first: `docs` needs (doc_id,
    * text). */
  def repetitionOf(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    docs
      .select(col("doc_id"), n.cast("long").as("n_tokens"),
        topTokenFreq(t).as("top_token_freq"),
        fracDupKgram(t, n, 2).as("frac_dup_2gram"),
        fracDupKgram(t, n, 3).as("frac_dup_3gram"))
      .withColumn("frac_top_token",
        round(col("top_token_freq").cast("double") / col("n_tokens"), 4))
  }

  def textRepetition(s: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.documents(s, dir))

  val textRepetitionSql: String =
    s"""SELECT doc_id,
       CAST(len($TokensSql) AS BIGINT) AS n_tokens,
       $topTokenFreqSql AS top_token_freq,
       ${fracDupKgramSql(2)} AS frac_dup_2gram,
       ${fracDupKgramSql(3)} AS frac_dup_3gram,
       round(CAST($topTokenFreqSql AS DOUBLE) / len($TokensSql), 4) AS frac_top_token
       FROM documents"""

  /** The quality gate's keep decision as ONE reusable Column -- the
    * streaming intake path filters on this without materializing the
    * per-rule report. MUST stay formula-identical to [[qualityGate]]
    * (StreamingIngestSpec enforces stream/batch parity at runtime). */
  def keepExpr(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    val nTok = n.cast("long")
    val diversity = round(size(array_distinct(t)).cast("double") / n, 4)
    val fracTop = round(topTokenFreq(t).cast("double") / nTok, 4)
    val dup3 = fracDupKgram(t, n, 3)
    coalesce(nTok >= QualityMinTokens, lit(false)) &&
      coalesce(diversity >= QualityMinDiversity, lit(false)) &&
      coalesce(fracTop <= QualityMaxTopTokenFrac, lit(false)) &&
      coalesce(dup3 <= QualityMaxDup3gramFrac, lit(false))
  }

  /** Composed quality gate (the filter stage a training-data pipeline
    * runs before dedup): per-rule booleans, an overall keep flag, and
    * the first failing rule as drop_reason. Thresholds are the
    * Quality* constants above. */
  def qualityGate(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val metrics = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      n.cast("long").as("n_tokens"),
      round(size(array_distinct(t)).cast("double") / n, 4).as("lexical_diversity"),
      topTokenFreq(t).as("top_token_freq"),
      fracDupKgram(t, n, 3).as("frac_dup_3gram"))
    val scored = metrics.withColumn("frac_top_token",
      round(col("top_token_freq").cast("double") / col("n_tokens"), 4))
    scored.select(
      col("doc_id"), col("lang"), col("n_tokens"), col("lexical_diversity"),
      col("frac_top_token"), col("frac_dup_3gram"),
      // coalesce(_, false): a NULL text yields NULL metrics, and a
      // NULL rule boolean would leave keep = NULL -- neither kept nor
      // dropped-with-reason. NULL/empty docs must fail the gate, not
      // silently skip it.
      coalesce(col("n_tokens") >= QualityMinTokens, lit(false)).as("r_len"),
      coalesce(col("lexical_diversity") >= QualityMinDiversity, lit(false)).as("r_diversity"),
      coalesce(col("frac_top_token") <= QualityMaxTopTokenFrac, lit(false)).as("r_top_token"),
      coalesce(col("frac_dup_3gram") <= QualityMaxDup3gramFrac, lit(false)).as("r_dup_3gram"))
      .withColumn("keep",
        col("r_len") && col("r_diversity") && col("r_top_token") && col("r_dup_3gram"))
      .withColumn("drop_reason",
        when(!col("r_len"), "too_short")
          .when(!col("r_diversity"), "low_diversity")
          .when(!col("r_top_token"), "repeated_top_token")
          .when(!col("r_dup_3gram"), "repeated_3grams"))
  }

  val qualityGateSql: String =
    s"""WITH m AS (
         SELECT doc_id, lang,
           CAST(len($TokensSql) AS BIGINT) AS n_tokens,
           round(CAST(len(list_distinct($TokensSql)) AS DOUBLE) / len($TokensSql), 4) AS lexical_diversity,
           round(CAST($topTokenFreqSql AS DOUBLE) / len($TokensSql), 4) AS frac_top_token,
           ${fracDupKgramSql(3)} AS frac_dup_3gram
         FROM documents),
       r AS (
         SELECT *,
           coalesce(n_tokens >= $QualityMinTokens, false) AS r_len,
           coalesce(lexical_diversity >= $QualityMinDiversity, false) AS r_diversity,
           coalesce(frac_top_token <= $QualityMaxTopTokenFrac, false) AS r_top_token,
           coalesce(frac_dup_3gram <= $QualityMaxDup3gramFrac, false) AS r_dup_3gram
         FROM m)
       SELECT doc_id, lang, n_tokens, lexical_diversity, frac_top_token,
         frac_dup_3gram, r_len, r_diversity, r_top_token, r_dup_3gram,
         (r_len AND r_diversity AND r_top_token AND r_dup_3gram) AS keep,
         CASE WHEN NOT r_len THEN 'too_short'
              WHEN NOT r_diversity THEN 'low_diversity'
              WHEN NOT r_top_token THEN 'repeated_top_token'
              WHEN NOT r_dup_3gram THEN 'repeated_3grams'
         END AS drop_reason
       FROM r"""

  /** Email pattern shared by both engines (Java regex and DuckDB's
    * RE2 read it identically -- keep it free of lookarounds, which
    * RE2 lacks). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad pattern; word-bounded so version strings like
    * 1.2.3.4000 don't half-match. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII scrub -- the redaction stage a training-data pipeline runs
    * before release: per-doc match counts for emails and IPv4
    * literals plus the scrubbed text (matches replaced by typed
    * placeholder tags). Pure per-row regex projections -- no shuffle,
    * scan-scales; patterns are chosen to parse identically under
    * Java regex and RE2 so the oracle gate pins behavior
    * cross-engine. DataFrame-first: `docs` needs (doc_id, text). */
  def piiScrubOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_replace(
        regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>").as("text_scrubbed"))

  def piiScrub(s: SparkSession, dir: String): DataFrame =
    piiScrubOf(Tables.documents(s, dir))

  val piiScrubSql: String =
    s"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '$EmailPattern')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '$Ipv4Pattern')) AS BIGINT) AS n_ipv4,
       regexp_replace(regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g'),
         '$Ipv4Pattern', '<IP>', 'g') AS text_scrubbed
       FROM documents"""

  /** Document fingerprinting: whole-document md5 plus a winnowing-style
    * rolling fingerprint (min 60-bit hash over all 8-token windows --
    * robust to local edits, the building block of containment dedup).
    *
    * Repartitioned before the projection: the per-window md5 makes
    * this the most compute-dense projection in the suite, and the
    * sf0.1 parquet is a single file = a single scan task. Same
    * discipline as every dedup path -- operator parallelism must not
    * be hostage to input file splits. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val windows = transform(sequence(lit(1), n - lit(7)),
      i => h15(array_join(slice(t, i, lit(8)), " ")))
    Tables.documents(s, dir)
      .repartition(graft.ops.DedupOps.JoinParallelism)
      .select(
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

  // ------------------------------------------------ chunking + packing

  /** Context-window size (tokens) for [[chunkOf]]. 16 keeps the
    * synthetic corpus multi-chunk; training deployments pass their
    * model's context length through the [[graft.api.Text.chunk]]
    * parameter. */
  val ChunkTokens = 16

  /** Fixed-window document chunking -- the "split each doc into
    * context windows" stage of training-data prep. Non-overlapping
    * windows of `size` tokens; the final window keeps the remainder
    * (possibly short) so every token lands in exactly one chunk.
    *
    * Shape: per-row projection + posexplode -- NO shuffle; at 100 TB
    * this is one WholeStageCodegen pass over the scan with only
    * (doc_id, text) read, output rows ~ n_tokens/size per doc.
    * `chunk_hash` feeds chunk-level exact dedup downstream. */
  def chunkOf(docs: DataFrame, chunkTokens: Int = ChunkTokens): DataFrame = {
    val t = tokens(col("text"))
    val windows = transform(
      sequence(lit(1), greatest(size(t), lit(1)), lit(chunkTokens)),
      st => slice(t, st, lit(chunkTokens)))
    docs
      .select(col("doc_id"), posexplode(windows).as(Seq("chunk_id", "toks")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("int").as("chunk_id"),
        size(col("toks")).cast("long").as("n_chunk_tokens"),
        array_join(col("toks"), " ").as("chunk_text"))
      .withColumn("chunk_hash", h15(col("chunk_text")))
  }

  def chunk(s: SparkSession, dir: String): DataFrame =
    chunkOf(Tables.documents(s, dir))

  val chunkSql: String =
    s"""WITH w AS (
         SELECT doc_id, $TokensSql AS toks,
           unnest(generate_series(1, greatest(len($TokensSql), 1), $ChunkTokens)) AS st
         FROM documents)
       SELECT doc_id,
         CAST((st - 1) // $ChunkTokens AS INT) AS chunk_id,
         CAST(len(toks[st:st + ${ChunkTokens - 1}]) AS BIGINT) AS n_chunk_tokens,
         array_to_string(toks[st:st + ${ChunkTokens - 1}], ' ') AS chunk_text,
         ${h15Sql(s"array_to_string(toks[st:st + ${ChunkTokens - 1}], ' ')")} AS chunk_hash
       FROM w"""

  // ------------------------------------ content-defined chunking (CDC)

  /** Rolling-window tokens per CDC boundary test. */
  val CdcWindow = 4
  /** Boundary when the window hash % divisor == 0 -> ~divisor-token
    * average chunks (geometric lengths). */
  val CdcDivisor = 16
  /** Hard cap: sub-boundaries at chunk-relative multiples of this, so
    * a hash-unlucky run cannot produce unbounded chunks. P(content
    * chunk > 64) = (15/16)^64 ~ 1.6%, so the cap is the tail guard,
    * not the common path. */
  val CdcMaxTokens = 64

  /** Content-defined chunking: a boundary falls AFTER token i exactly
    * when the rolling `window`-token hash ending at i is 0 mod
    * `divisor` -- the rsync/LBFS trick on tokens. Unlike fixed-width
    * [[chunkOf]], boundaries depend only on LOCAL content, so an
    * insert or delete re-chunks the edit's neighborhood and NOTHING
    * else: every chunk whose span lies beyond the edit keeps its
    * exact text and hash -- the property that makes chunk-level dedup
    * and delta storage work across document versions. The `maxTokens`
    * cap adds sub-boundaries at chunk-relative offsets (alignment is
    * preserved: chunk starts are content-defined, so relative offsets
    * shift with them).
    *
    * Scale shape: one narrow (doc, pos, token, boundary-flag) stream
    * off the scan (the rolling hash is a per-row expression over the
    * in-row token array -- no self-join); chunk ids are per-DOC
    * running sums -- doc-keyed windows whose per-task state is
    * bounded by document length, the same cost class as [[packOf]]'s
    * stream windows; then one (doc, chunk) aggregation. Nothing is
    * corpus-wide but the final group-by. */
  def cdcChunkOf(docs: DataFrame, window: Int = CdcWindow,
      divisor: Int = CdcDivisor, maxTokens: Int = CdcMaxTokens): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val t = tokens(col("text"))
    val pos = docs.select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        posexplode(transform(col("t"), (tok, i) =>
          struct(tok.as("tok"),
            when(i >= window - 1,
              pmod(h15(concat_ws(" ",
                slice(col("t"), i - lit(window - 2), lit(window)))),
                lit(divisor)) === 0)
              .otherwise(lit(false)).as("b")))).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"),
        col("s.tok").as("tok"), col("s.b").as("b"))
    val wPrev = W.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(W.unboundedPreceding, -1)
    val cids = pos.withColumn("cid",
      coalesce(sum(col("b").cast("long")).over(wPrev), lit(0L)))
    val sub = cids.withColumn("cstart",
        min(col("pos")).over(W.partitionBy(col("doc_id"), col("cid"))))
      .withColumn("scid",
        ((col("pos") - col("cstart")) / lit(maxTokens)).cast("long"))
    sub.groupBy(col("doc_id"), col("cid"), col("scid"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_chunk_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok"))).as("chunk_text"))
      .withColumn("chunk_idx", (row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("start_pos"))) - 1).cast("int"))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        col("n_chunk_tokens"), col("chunk_text"),
        h15(col("chunk_text")).as("chunk_hash"))
  }

  def cdcChunk(s: SparkSession, dir: String): DataFrame =
    cdcChunkOf(Tables.documents(s, dir))

  val cdcChunkSql: String = {
    val w = CdcWindow
    val d = CdcDivisor
    val m = CdcMaxTokens
    val winHash = h15Sql(s"array_to_string(t[i-${w - 1}:i], ' ')")
    s"""WITH tk AS (SELECT doc_id, $TokensSql AS t FROM documents),
       p0 AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t)), i ->
             {'pos': CAST(i - 1 AS INT), 'tok': t[i],
              'b': CASE WHEN i >= $w THEN ($winHash) % $d = 0
                   ELSE false END})) AS s
         FROM tk),
       p AS (SELECT doc_id, s.pos AS pos, s.tok AS tok, s.b AS b FROM p0),
       c AS (SELECT *, coalesce(sum(CASE WHEN b THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
         FROM p),
       s2 AS (SELECT *, min(pos) OVER (PARTITION BY doc_id, cid) AS cstart
              FROM c),
       g AS (SELECT doc_id, cid, (pos - cstart) // $m AS scid,
               min(pos) AS start_pos,
               CAST(count(*) AS BIGINT) AS n_chunk_tokens,
               array_to_string(array_agg(tok ORDER BY pos), ' ') AS chunk_text
             FROM s2 GROUP BY 1, 2, 3)
       SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) - 1
           AS INT) AS chunk_idx,
         start_pos, n_chunk_tokens, chunk_text,
         ${h15Sql("chunk_text")} AS chunk_hash
       FROM g"""
  }

  /** Token budget per training bin for [[packOf]]. */
  val PackBudget = 256L

  /** Concat-and-chunk sequence packing: documents of one stream
    * (here: `lang`) are laid end-to-end in doc_id order into a token
    * stream that training slices into `budget`-token bins; the op
    * reports each doc's start offset and first/last bin plus whether
    * it straddles a bin boundary (= will be split across training
    * sequences).
    *
    * Shape: one narrow projection, then the per-stream prefix sum in
    * [[BoundedWindows.prefixSum]]'s bucket-offset decomposition --
    * streams are low-cardinality BY DESIGN (a handful of languages
    * regardless of corpus size), so a plain per-stream window would
    * sort a whole language in one task at 100 TB; the bounded shape
    * computes the identical offsets with no window partition wider
    * than ~1/256 of a stream. Sharding the stream key ((lang, shard)
    * via [[graft.api.Text.pack]]) remains available when even
    * bin-local sort state must shrink, at the cost of a different
    * (sharded) bin layout. */
  def packOf(docs: DataFrame, budget: Long = PackBudget,
             stream: Column = col("lang")): DataFrame = {
    val n = size(tokens(col("text"))).cast("long")
    BoundedWindows.prefixSum(
      docs.select(col("doc_id"), stream.as("stream"), n.as("n_tokens")),
      parts = Seq("stream"), ord = "doc_id", ties = Nil,
      value = col("n_tokens"), outCol = "end_offset")
      .select(
        col("doc_id"), col("stream"), col("n_tokens"),
        (col("end_offset") - col("n_tokens")).as("start_offset"),
        expr(s"(end_offset - n_tokens) DIV $budget").as("bin_first"),
        expr(s"(end_offset - 1) DIV $budget").as("bin_last"))
      .withColumn("straddles", col("bin_first") < col("bin_last"))
  }

  def pack(s: SparkSession, dir: String): DataFrame =
    packOf(Tables.documents(s, dir))

  val packSql: String =
    s"""WITH s AS (
         SELECT doc_id, lang AS stream,
           CAST(len($TokensSql) AS BIGINT) AS n_tokens
         FROM documents),
       c AS (
         SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id) AS BIGINT)
           AS end_offset
         FROM s)
       SELECT doc_id, stream, n_tokens,
         end_offset - n_tokens AS start_offset,
         (end_offset - n_tokens) // $PackBudget AS bin_first,
         (end_offset - 1) // $PackBudget AS bin_last,
         ((end_offset - n_tokens) // $PackBudget) < ((end_offset - 1) // $PackBudget) AS straddles
       FROM c"""

  // ---------------------------------------------- corpus report card

  /** Per-source corpus report card: doc counts, quality-gate keep
    * rate, per-drop-reason counts, mean token length -- the summary a
    * data curator reads before deciding which sources feed training.
    *
    * Shape: the quality-gate projection (narrow, shuffle-free) joined
    * back to (doc_id, source) on the unique id, then one map-side-
    * combinable groupBy(source). Sources are low-cardinality, so the
    * final agg state is tiny; the join is id-to-id (no blowup). */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val g = qualityGate(s, dir)
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    def reasonCount(r: String): Column =
      sum(when(col("drop_reason") === r, 1L).otherwise(0L)).as(s"n_$r")
    g.join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        reasonCount("too_short"),
        reasonCount("low_diversity"),
        reasonCount("repeated_top_token"),
        reasonCount("repeated_3grams"),
        sum(col("n_tokens")).as("sum_tokens"))
      .select(
        col("source"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 4).as("keep_rate"),
        col("n_too_short"), col("n_low_diversity"),
        col("n_repeated_top_token"), col("n_repeated_3grams"),
        round(col("sum_tokens").cast("double") / col("n_docs"), 2).as("avg_tokens"))
  }

  val corpusReportSql: String = {
    def reasonCountSql(r: String): String =
      s"CAST(sum(CASE WHEN g.drop_reason = '$r' THEN 1 ELSE 0 END) AS BIGINT) AS n_$r"
    s"""WITH g AS ($qualityGateSql)
       SELECT d.source,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         round(CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
           AS keep_rate,
         ${reasonCountSql("too_short")},
         ${reasonCountSql("low_diversity")},
         ${reasonCountSql("repeated_top_token")},
         ${reasonCountSql("repeated_3grams")},
         round(CAST(sum(g.n_tokens) AS DOUBLE) / count(*), 2) AS avg_tokens
       FROM g JOIN documents d USING (doc_id)
       GROUP BY 1"""
  }

  // ------------------------------------------- unigram LM quality score

  /** Fixed-point quantum for per-token log-probabilities: ln values
    * are quantized to 1e-6 integers so the per-doc aggregation is an
    * exact integer sum -- order-independent and bit-identical across
    * engines (same trick as emb_centroids' quantized sums; a double
    * sum's rounding would depend on Spark's partition order). */
  val LogpQuantum = 1000000L

  /** Size gate for the derived LM/NB model tables: the model rides a
    * forced `broadcast(...)` into its scoring join only while the
    * INPUT corpus' plan-estimated bytes stay under this bound; above
    * it the join runs shuffled on the token/bigram key (the only
    * shape that survives a corpus whose bigram vocab is billions of
    * rows at 100 TB -- vocab size is bounded by input token count, so
    * input bytes are a free, pre-execution upper-bound proxy; no
    * gate-only count job). Configurable per session; the 64 MB
    * default comfortably broadcasts a lexicon-sized model and refuses
    * anything corpus-proportional. Spark's own auto-broadcast may
    * still kick in above the gate when ITS size estimate is small --
    * the gate only removes the unconditional builder-forced hint. */
  private[graft] def modelBroadcastMaxBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.text.modelBroadcastMaxInputBytes")
      .map(_.toLong).getOrElse(64L * 1024 * 1024)

  private def fitsBroadcast(input: DataFrame): Boolean =
    input.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(modelBroadcastMaxBytes(input.sparkSession))

  /** Forced-broadcast under the size gate, plain (shuffled) join side
    * above it. */
  private def gated(rel: DataFrame, fits: Boolean): DataFrame =
    if (fits) broadcast(rel) else rel

  /** Round-robin spread for a SMALL scan feeding a CPU-heavy
    * tokenize+explode: a sub-split-size parquet file plans one task,
    * serializing the whole explode on one core. Fires only when the
    * input plans fewer partitions than the session's parallelism --
    * at real corpus scale the scan already has thousands of tasks and
    * NO shuffle is added (the condition is checked on the plan, not
    * the data). */
  private def spread(docs: DataFrame): DataFrame = {
    val target = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
  }

  /** Corpus-unigram log-probability score per document -- the
    * CCNet-style "LM perplexity" quality filter with the corpus
    * itself as the language model: score(d) = avg over token
    * occurrences of ln p(tok), p from corpus unigram counts.
    * Unusually-worded / repetitive-rare-token docs score low.
    *
    * Shape: explode -> per-(doc,token) counts (map-side combinable,
    * MATERIALIZED once -- model and scoring both consume it), vocab =
    * second map-side-combinable agg over that, then the per-doc score
    * re-joins tf against the size-gated vocab model
    * ([[modelBroadcastMaxBytes]]: broadcast below the gate, shuffled
    * token-key join above) and reduces by doc_id. */
  def unigramLogprobOf(docs: DataFrame): DataFrame = {
    val fits = fitsBroadcast(docs)
    val tf = DedupOps.materializeOnce(spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("n_total"))
    val logp = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt") / col("n_total")) * LogpQuantum, 0)
          .cast("long").as("logp_u"))
    tf.join(gated(logp, fits), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * col("logp_u")).as("sum_u"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_u") / (col("n_tokens") * lit(LogpQuantum.toDouble)), 4)
          .as("avg_logprob"))
  }

  def unigramLogprob(s: SparkSession, dir: String): DataFrame =
    unigramLogprobOf(Tables.documents(s, dir))

  /** Corpus-bigram LM score per document with unigram-interpolated
    * backoff -- the next step up from [[unigramLogprobOf]] on the
    * CCNet-style LM-quality-filter ladder, sensitive to unusual word
    * ORDER, not just unusual words:
    * {{{
    * score(d) = avg over bigrams (w1,w2) of
    *            ln ((c(w1,w2) + p_u(w2)) / (c1(w1) + 1))
    * }}}
    * (add-one interpolation: an unseen continuation backs off to the
    * corpus unigram probability of w2). Documents with fewer than two
    * tokens have no bigrams and drop from the output.
    *
    * Shape: ONE tokenize pass -- each token occurrence becomes a
    * (w, nxt) pair (nxt null for a doc's last token), counted per doc
    * and MATERIALIZED once, so the bigram counts, first-word totals,
    * AND the unigram backoff model all derive from the same exploded
    * stream instead of tokenizing the corpus twice. Every model-table
    * join (c1, uni, and the scoring lp join) is size-gated by
    * [[modelBroadcastMaxBytes]]: broadcast below the gate, shuffled
    * key join above it -- bigram vocabs grow near-linearly with the
    * corpus and are NOT broadcastable at 100 TB. Log values are
    * 1e-6-quantized integers so per-doc sums are exact and
    * order-independent ([[LogpQuantum]]). */
  def bigramLogprobOf(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    // get() is 0-based and null-safe out-of-range (element_at throws
    // under ANSI), so the last token pairs with a null continuation
    val pairs = transform(t, (x, i) => struct(x.as("w"), get(t, i + 1).as("nxt")))
    val fits = fitsBroadcast(docs)
    val pairTf = DedupOps.materializeOnce(spread(docs)
      .select(col("doc_id"), explode(pairs).as("p"))
      .groupBy(col("doc_id"), col("p.w").as("w"), col("p.nxt").as("nxt"))
      .agg(count(lit(1)).as("cnt")))
    // (doc_id, w, nxt) is unique after the groupBy, so this IS the
    // per-(doc,bigram) count -- no second aggregate needed
    val bf = pairTf.filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat(col("w"), lit(" "), col("nxt")).as("bigram"),
        col("cnt").as("bf"))
    val v2 = pairTf.filter(col("nxt").isNotNull)
      .groupBy(col("w"), col("nxt")).agg(sum(col("cnt")).as("c2"))
      .select(concat(col("w"), lit(" "), col("nxt")).as("bigram"),
        col("w").as("w1"), col("nxt").as("w2"), col("c2"))
    val c1 = v2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // unigram model over ALL token occurrences (not just bigram
    // starts): every occurrence is exactly one pair row
    val uni = pairTf.groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
      .select(col("w").as("w2"), col("cnt"))
    val total = uni.agg(sum(col("cnt")).cast("double").as("n_total"))
    val lp = v2
      .join(gated(c1, fits), Seq("w1"))
      .join(gated(uni, fits), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"),
        round(log((col("c2") + col("cnt") / col("n_total")) / (col("c1") + 1))
          * LogpQuantum, 0).cast("long").as("logp_b"))
    bf.join(gated(lp, fits), Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).cast("long").as("n_bigrams"),
        sum(col("bf") * col("logp_b")).as("sum_b"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_b") / (col("n_bigrams") * lit(LogpQuantum.toDouble)), 4)
          .as("avg_logprob2"))
  }

  def bigramLogprob(s: SparkSession, dir: String): DataFrame =
    bigramLogprobOf(Tables.documents(s, dir))

  /** Dimensionality of the hashing-trick text embedder. */
  val HashEmbedDim = 64

  /** Feature-hashing text embedding (the "hashing trick"): each token
    * occurrence adds +-1 to one of `dim` buckets -- bucket and sign
    * both derive from the shared 60-bit content hash, so the embedding
    * is fully deterministic, model-free, and cross-engine exact
    * (values are integer sign-counts; no floats anywhere). Emitted
    * SPARSE as (doc_id, pos, v != 0) rows -- the honest at-rest shape;
    * [[hashEmbedDense]] densifies for the cosine/ANN operators.
    *
    * Bridges the text surface to the similarity surface with no
    * external model: hashed embeddings preserve enough token-profile
    * cosine structure for near-dup screening and clustering (the
    * classic sparse-projection argument), with one
    * map-side-combinable aggregate as the entire cost. */
  def hashEmbedOf(docs: DataFrame, dim: Int = HashEmbedDim): DataFrame = {
    val h = Hashing.h15(col("token"))
    // the sign rides an independent prefixed hash: deriving it from
    // h's high bits would need 60-bit integer division, which Spark's
    // Column./ computes in double (inexact past 2^53)
    val sign = pmod(Hashing.h15(concat(lit("sign:"), col("token"))), lit(2L))
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .select(col("doc_id"), pmod(h, lit(dim.toLong)).as("pos"),
        when(sign === 0, lit(1L)).otherwise(lit(-1L)).as("s"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("s")).as("v"))
      .filter(col("v") =!= 0)
  }

  def hashEmbed(s: SparkSession, dir: String): DataFrame =
    hashEmbedOf(Tables.documents(s, dir))

  val hashEmbedSql: String = {
    val h = h15Sql("tok")
    val sgn = s"CASE WHEN ${h15Sql("concat('sign:', tok)")} % 2 = 0 THEN 1 ELSE -1 END"
    s"""SELECT doc_id, $h % $HashEmbedDim AS pos,
         CAST(sum($sgn) AS BIGINT) AS v
       FROM (SELECT doc_id, unnest($TokensSql) AS tok FROM documents)
       GROUP BY 1, 2
       HAVING CAST(sum($sgn) AS BIGINT) <> 0"""
  }

  /** Batch perceptron over the hashing-trick features -- the
    * TRAINABLE linear classifier rung that, unlike every
    * sigmoid/softmax learner, runs in PURE INTEGER arithmetic: lr=1
    * weights are exact sums of {-1,+1}-weighted feature counts, so
    * training is partition-order-invariant and the fitted model
    * hash-matches across engines -- no other trainable-model family
    * offers that (NB needed log quantization; logistic regression
    * cannot be pinned at all because exp() bit-parity across libm
    * implementations is not a contract).
    *
    * Batch (not online) update, the distributed-natural variant:
    * epoch = score every doc under the current weights (one
    * broadcast-model join + map-side-combinable per-doc sum), collect
    * the misclassified set (y * margin <= 0, so the all-zero initial
    * model marks everything misclassified -- the textbook first
    * step), add sum(y * x) over it to the weights and sum(y) to the
    * bias. The feature table is materialized once and re-streamed per
    * epoch; the model (<= dim rows) rides a broadcast both ways --
    * nothing corpus-sized ever shuffles, epochs scale as one scan
    * each.
    *
    * Output: (doc_id, margin, pred in {-1, 1}) under the fitted
    * weights. */
  def perceptronOf(docs: DataFrame, label: Column, epochs: Int = 3,
      dim: Int = HashEmbedDim): DataFrame = {
    val feats = DedupOps.materializeOnce(hashEmbedOf(docs, dim))
    val labels = DedupOps.materializeOnce(
      docs.select(col("doc_id"), label.cast("long").as("y")))
    var w = feats.select(col("pos").as("j")).distinct()
      .select(col("j"), lit(0L).as("wv"))
    var b = labels.sparkSession.range(1).select(lit(0L).as("bv"))
    def margins = {
      val dot = feats.as("f")
        .join(broadcast(w).as("w"), expr("f.pos = w.j"))
        .groupBy(col("f.doc_id").as("mdoc"))
        .agg(sum(col("f.v") * col("w.wv")).as("dot"))
      labels.as("l")
        .join(dot.as("d"), expr("l.doc_id = d.mdoc"), "left")
        .crossJoin(broadcast(b))
        .select(col("l.doc_id"), col("l.y"),
          (coalesce(col("d.dot"), lit(0L)) + col("bv")).as("m"))
    }
    for (_ <- 1 to epochs) {
      val mis = margins.filter(col("y") * col("m") <= 0)
        .select(col("doc_id"), col("y"))
      // the misclassified set can be corpus-sized in epoch 1 (every
      // doc under zero weights) -- NOT broadcastable; a plain doc_id
      // equi-join lets AQE pick, and the (j, g) gradient that comes
      // out is model-sized
      val gw = feats.as("f")
        .join(mis.as("mi"), expr("f.doc_id = mi.doc_id"))
        .groupBy(col("f.pos").as("j")).agg(sum(col("f.v") * col("mi.y")).as("g"))
      // rebuild w eagerly so the loop never stacks un-evaluated
      // model lineage
      w = DedupOps.materializeOnce(
        w.as("w").join(gw.as("g"), expr("w.j = g.j"), "left")
          .select(col("w.j").as("j"),
            (col("w.wv") + coalesce(col("g.g"), lit(0L))).as("wv")))
      b = DedupOps.materializeOnce(
        b.crossJoin(mis.agg(coalesce(sum(col("y")), lit(0L)).as("gy")))
          .select((col("bv") + col("gy")).as("bv")))
    }
    // materialize the scored output BEFORE dropping the feature /
    // label checkpoints it is built from
    val out = DedupOps.materializeOnce(margins
      .select(col("doc_id"), col("m").as("margin"),
        when(col("m") > 0, lit(1)).otherwise(lit(-1)).as("pred")))
    DedupOps.releaseOnce(feats)
    DedupOps.releaseOnce(labels)
    out
  }

  /** Oracle binding: English-vs-rest perceptron on the documents
    * table (y = +1 for lang = 'en'), 3 epochs. */
  def textPerceptron(s: SparkSession, dir: String): DataFrame =
    perceptronOf(Tables.documents(s, dir),
      when(col("lang") === "en", 1L).otherwise(-1L))

  /** The same 3 batch epochs as chained CTEs: per epoch a margin CTE
    * under the previous weights, the misclassified set, and the
    * weight/bias update -- integer throughout. */
  val textPerceptronSql: String = {
    def margin(w: String, bb: String, m: String): String =
      s"""$m AS (SELECT l.doc_id, l.y, COALESCE(d.dot, 0) + (SELECT bv FROM $bb) AS m
           FROM lab l LEFT JOIN (
             SELECT f.doc_id, sum(f.v * $w.wv) AS dot
             FROM feat f JOIN $w ON f.pos = $w.j GROUP BY 1) d
           ON l.doc_id = d.doc_id)"""
    def upd(mPrev: String, wPrev: String, bPrev: String,
        mis: String, w: String, bb: String): String =
      s"""$mis AS (SELECT doc_id, y FROM $mPrev WHERE y * m <= 0),
         $w AS (SELECT $wPrev.j, $wPrev.wv + COALESCE(g.g, 0) AS wv
                FROM $wPrev LEFT JOIN (
                  SELECT f.pos AS j, sum(f.v * mi.y) AS g
                  FROM feat f JOIN $mis mi ON f.doc_id = mi.doc_id
                  GROUP BY 1) g ON $wPrev.j = g.j),
         $bb AS (SELECT (SELECT bv FROM $bPrev)
                   + COALESCE((SELECT sum(y) FROM $mis), 0) AS bv)"""
    s"""WITH feat AS ($hashEmbedSql),
       lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
               FROM documents),
       w0 AS (SELECT DISTINCT pos AS j, 0 AS wv FROM feat),
       b0 AS (SELECT 0 AS bv),
       ${margin("w0", "b0", "m1")},
       ${upd("m1", "w0", "b0", "mis1", "w1", "b1")},
       ${margin("w1", "b1", "m2")},
       ${upd("m2", "w1", "b1", "mis2", "w2", "b2")},
       ${margin("w2", "b2", "m3")},
       ${upd("m3", "w2", "b2", "mis3", "w3", "b3")},
       ${margin("w3", "b3", "m4")}
       SELECT doc_id, CAST(m AS BIGINT) AS margin,
              CASE WHEN m > 0 THEN 1 ELSE -1 END AS pred
       FROM m4"""
  }

  /** Dense form of [[hashEmbedOf]]: (doc_id, emb array<double> of
    * length `dim`) -- feed directly into the cosine / sign-LSH / IVF
    * operators for model-free semantic screening. */
  def hashEmbedDense(docs: DataFrame, dim: Int = HashEmbedDim): DataFrame =
    hashEmbedOf(docs, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          p => coalesce(element_at(col("m"), p.cast("long")), lit(0L))
            .cast("double"))
          .as("emb"))

  val bigramLogprobSql: String =
    s"""WITH toks AS (SELECT doc_id, $TokensSql AS toks FROM documents),
       bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
              FROM (SELECT doc_id, toks,
                      unnest(generate_series(1, len(toks) - 1)) AS i
                    FROM toks WHERE len(toks) >= 2)),
       bf AS (SELECT doc_id, bigram, count(*) AS bf FROM bg GROUP BY 1, 2),
       v2 AS (SELECT bigram, sum(bf) AS c2,
                     split_part(bigram, ' ', 1) AS w1,
                     split_part(bigram, ' ', 2) AS w2
              FROM bf GROUP BY 1),
       c1 AS (SELECT w1, sum(c2) AS c1 FROM v2 GROUP BY 1),
       uni AS (SELECT tok AS w2, count(*) AS cnt
               FROM (SELECT unnest($TokensSql) AS tok FROM documents)
               GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total
               FROM (SELECT unnest($TokensSql) AS tok FROM documents)),
       lp AS (SELECT bigram,
                CAST(round(ln((c2 + cnt / n_total) / (c1 + 1)) * $LogpQuantum)
                  AS BIGINT) AS logp_b
              FROM v2 JOIN c1 USING (w1) JOIN uni USING (w2), tot)
       SELECT bf.doc_id,
         CAST(sum(bf.bf) AS BIGINT) AS n_bigrams,
         round(sum(bf.bf * lp.logp_b) / (sum(bf.bf) * $LogpQuantum.0), 4)
           AS avg_logprob2
       FROM bf JOIN lp USING (bigram)
       GROUP BY 1"""

  /** Multinomial Naive Bayes classifier -- the TRAINABLE rung of the
    * curation ladder (the fastText-quality-filter / learned-lang-id
    * shape: fit on a small labeled set, score the whole corpus).
    * Add-one smoothing, class priors from doc counts, unseen tokens
    * back off to each class's smoothing floor.
    *
    * Deterministic end-to-end, so an ML-ish op sits under the hash
    * gate: the model is integer token counts, every log term is
    * 1e-6-quantized ([[LogpQuantum]]) before the per-(doc, class)
    * integer sum (order-invariant), and the argmax breaks ties on the
    * smaller label.
    *
    * Shape: the model is two map-side-combinable count aggregates
    * (class-token, class totals -- the class-token counts are
    * MATERIALIZED once and feed totals, vocab, and the dense model)
    * plus 1-row vocab/doc counts; scoring joins the (doc, token)
    * count stream against the size-gated model
    * ([[modelBroadcastMaxBytes]]: broadcast when the labeled set is
    * lexicon-scale, shuffled token-key join when it is itself
    * corpus-scale), reduces at (doc, class), and takes a doc-sized
    * argmax window. The corpus never reshuffles wider than its
    * (doc, token) stream. At 100 TB the model comes precomputed from
    * the labeled set, leaving scoring a single model-join pass. */
  def nbClassifyOf(labeled: DataFrame, unlabeled: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fits = fitsBroadcast(labeled)
    val tfTrain0 = spread(labeled)
      .select(col("label"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("label"), col("token")).agg(count(lit(1)).as("cnt"))
    // four consumers (totals, vocab, model, vsize): a lexicon-scale
    // labeled set recomputes cheaply (same argument as broadcasting
    // it); a corpus-scale one is materialized once instead of
    // re-exploded four times
    val tfTrain = if (fits) tfTrain0 else DedupOps.materializeOnce(tfTrain0)
    val classTotals = tfTrain.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val priors = labeled.groupBy(col("label")).agg(count(lit(1)).as("nc"))
    val nDocs = labeled.agg(count(lit(1)).cast("double").as("n_docs"))
    val vocab = tfTrain.select(col("token")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("v_size"))
    // priors drive the class list (LEFT join): a label whose training
    // docs yield no tokens must still exist as a prior-only class --
    // an inner join would silently drop it while its docs inflate
    // n_docs, skewing every surviving prior
    val classes = priors
      .join(classTotals, Seq("label"), "left")
      .withColumn("tot", coalesce(col("tot"), lit(0L)))
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(vsize))
      .select(col("label"),
        round(log(col("nc") / col("n_docs")) * LogpQuantum, 0)
          .cast("long").as("qprior"),
        // empty-vocab corpus (all training text NULL/tokenless):
        // denom would be 0 and ln(1/0) throws under ANSI -- degrade
        // to qdefault 0 so NB degenerates to priors-only, honestly
        when(col("tot") + col("v_size") === 0, lit(0L))
          .otherwise(round(log(lit(1.0) / (col("tot") + col("v_size"))) * LogpQuantum, 0)
            .cast("long")).as("qdefault"),
        (col("tot") + col("v_size")).as("denom"))
    // DENSE over vocab x classes: an in-vocab token ABSENT from one
    // class's counts contributes that class's smoothing floor
    // ln(1/denom), not nothing -- a sparse model silently rewards the
    // class that never saw the token
    val model = vocab
      .crossJoin(broadcast(classes.select(col("label"), col("denom"))))
      .join(tfTrain, Seq("label", "token"), "left")
      .select(col("label"), col("token"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") / col("denom"))
          * LogpQuantum, 0).cast("long").as("qlogp"))
    val tfTest = spread(unlabeled)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val flagged = tfTest
      .join(gated(vocab.withColumn("in_v", lit(1)), fits), Seq("token"), "left")
    val matched = flagged.filter(col("in_v").isNotNull)
      .join(gated(model, fits), "token")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * col("qlogp")).as("m_u"))
    val unseen = flagged.filter(col("in_v").isNull)
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("u_tf"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_u").desc, col("label").asc)
    unlabeled.select(col("doc_id"))
      .crossJoin(broadcast(classes.select(col("label"), col("qprior"), col("qdefault"))))
      .join(matched, Seq("doc_id", "label"), "left")
      .join(unseen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        (col("qprior") + coalesce(col("m_u"), lit(0L)) +
          coalesce(col("u_tf"), lit(0L)) * col("qdefault")).as("score_u"))
      .withColumn("rk", row_number().over(byDoc)).filter(col("rk") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        round(col("score_u").cast("double") / LogpQuantum, 4).as("score"))
  }

  /** Table-bound twin: train on even doc_ids (class = lang), classify
    * the odd half -- the established even/odd split convention. */
  def textNbClassify(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    nbClassifyOf(
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang").as("label")),
      d.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")))
  }

  val textNbClassifySql: String =
    s"""WITH tr AS (SELECT doc_id, text, lang AS label FROM documents WHERE doc_id % 2 = 0),
       te AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
       tf_tr AS (SELECT label, tok AS token, count(*) AS cnt
                 FROM (SELECT label, unnest($TokensSql) AS tok FROM tr)
                 GROUP BY 1, 2),
       tot AS (SELECT label, sum(cnt) AS tot FROM tf_tr GROUP BY 1),
       pri AS (SELECT label, count(*) AS nc FROM tr GROUP BY 1),
       nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM tr),
       voc AS (SELECT DISTINCT token FROM tf_tr),
       vs AS (SELECT count(*) AS v_size FROM voc),
       cls AS (SELECT p.label,
                 CAST(round(ln(p.nc / n.n_docs) * $LogpQuantum) AS BIGINT) AS qprior,
                 CASE WHEN COALESCE(t.tot, 0) + v.v_size = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(round(ln(1.0 / (COALESCE(t.tot, 0) + v.v_size)) * $LogpQuantum) AS BIGINT)
                 END AS qdefault,
                 COALESCE(t.tot, 0) + v.v_size AS denom
               FROM pri p LEFT JOIN tot t USING (label) CROSS JOIN nd n CROSS JOIN vs v),
       model AS (SELECT c.label, v.token,
                   CAST(round(ln(CAST(COALESCE(f.cnt, 0) + 1 AS DOUBLE) / c.denom) * $LogpQuantum) AS BIGINT) AS qlogp
                 FROM voc v CROSS JOIN cls c
                 LEFT JOIN tf_tr f ON f.label = c.label AND f.token = v.token),
       tf_te AS (SELECT doc_id, tok AS token, count(*) AS tf
                 FROM (SELECT doc_id, unnest($TokensSql) AS tok FROM te)
                 GROUP BY 1, 2),
       m AS (SELECT t.doc_id, mo.label, CAST(sum(t.tf * mo.qlogp) AS BIGINT) AS m_u
             FROM tf_te t JOIN model mo USING (token) GROUP BY 1, 2),
       u AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS u_tf FROM tf_te
             WHERE token NOT IN (SELECT token FROM voc) GROUP BY 1),
       sc AS (SELECT d.doc_id, c.label,
                c.qprior + COALESCE(m.m_u, 0) + COALESCE(u.u_tf, 0) * c.qdefault AS score_u
              FROM (SELECT doc_id FROM te) d CROSS JOIN cls c
              LEFT JOIN m ON m.doc_id = d.doc_id AND m.label = c.label
              LEFT JOIN u ON u.doc_id = d.doc_id)
       SELECT doc_id, label AS pred_label,
         round(CAST(score_u AS DOUBLE) / $LogpQuantum, 4) AS score
       FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score_u DESC, label ASC) AS rk FROM sc)
       WHERE rk = 1"""

  val unigramLogprobSql: String =
    s"""WITH tf AS (
         SELECT doc_id, tok AS token, count(*) AS tf
         FROM (SELECT doc_id, unnest($TokensSql) AS tok FROM documents)
         GROUP BY 1, 2),
       v AS (SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1),
       t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM v),
       lp AS (SELECT token, CAST(round(ln(cnt / n_total) * $LogpQuantum) AS BIGINT) AS logp_u
              FROM v, t)
       SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         round(sum(tf.tf * lp.logp_u) / (sum(tf.tf) * $LogpQuantum.0), 4) AS avg_logprob
       FROM tf JOIN lp USING (token)
       GROUP BY 1"""

  // --------------------------------------------- BPE subword tokenizer

  /** Merge rounds for the demo BPE gate. Small ON PURPOSE: the oracle
    * unrolls training as chained CTEs, one block per round. The
    * DISTRIBUTED portion of BPE training is corpus -> word-frequency
    * table (one map-side-combinable aggregate, the only corpus-sized
    * step); the merge loop itself runs over the VOCAB table, whose
    * size is corpus-independent past saturation -- a production 30k-
    * merge run changes the loop count, not the scale shape. */
  val BpeMerges = 12

  /** A token as a spaced-symbol string: chars separated and flanked by
    * single spaces, so a learned merge (a, b) applies as the literal
    * string replace of " a b " -> " ab ". One global replace consumes
    * BOTH flanking spaces, so adjacent occurrences sharing a space
    * (" a b a b ") merge only alternately -- and RE2 (the oracle
    * engine) has no lookahead to fix that in one pass. Each merge
    * therefore applies as TWO sequential global replaces
    * ([[bpeApply]]): pass 1 takes the 1st/3rd/5th... occurrence of
    * any run, leaving every remaining occurrence isolated (its
    * neighbors are merged symbols), so pass 2 is a fixpoint -- a
    * merge can never create its own pair (the merged symbol a+b is a
    * single new symbol). The result equals classic greedy
    * left-to-right BPE merging, identically under Java regex and RE2.
    * Symbols stay regex-safe because BPE runs on [[normTokens]]
    * output (letters/digits only). BMP caveat as [[CharEntropy]]:
    * split("") splits UTF-16 code units; NFKC folds most
    * compatibility chars first and non-BMP letters are rare -- the
    * oracle's string_split(c, '') is codepoint-based, matching on all
    * BMP text. */
  private def bpeSpaced(tok: Column): Column =
    concat(lit(" "), array_join(split(tok, ""), " "), lit(" "))

  private def bpeApply(c: Column, a: String, b: String): Column = {
    val once = regexp_replace(c, lit(s" $a $b "), lit(s" $a$b "))
    regexp_replace(once, lit(s" $a $b "), lit(s" $a$b "))
  }

  /** Learn `merges` BPE merge rules from a corpus: word-frequency
    * table from the normalized tokens (the corpus-sized aggregate),
    * then per round ONE vocab-sized adjacent-pair count and a
    * deterministic argmax (freq desc, pair asc -- ties can never
    * diverge cross-engine), applying each winner to the vocab table
    * before the next round. Returns the rules in rank order; the
    * driver holds only the M-pair rule list (model-sized, like every
    * model surface here). Stops early if no pair repeats. */
  def bpeTrain(docs: DataFrame, merges: Int = BpeMerges): Seq[(String, String)] = {
    var words = DedupOps.materializeOnce(spread(docs)
      .select(explode(normTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .select(bpeSpaced(col("tok")).as("w"), col("freq")))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to merges if !done) {
      val s = split(trim(col("w")), " ")
      val pairs = words
        .select(col("freq"), explode(when(size(s) >= 2,
          transform(sequence(lit(1), size(s) - 1),
            i => struct(element_at(s, i).as("a"), element_at(s, i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        out += ((a, b))
        val next = DedupOps.materializeOnce(words.select(
          bpeApply(col("w"), a, b).as("w"), col("freq")))
        DedupOps.releaseOnce(words)
        words = next
      }
    }
    DedupOps.releaseOnce(words)
    out.toSeq
  }

  /** Encode a corpus with learned merge rules: each normalized token
    * becomes its spaced-symbol string and the rules apply IN RANK
    * ORDER (the defining BPE encode), then per-doc piece accounting.
    * One narrow projection pass with `merges.size` chained regex
    * replaces -- shuffle-free until the per-doc aggregate. */
  def bpeEncodeOf(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val enc = merges.foldLeft(bpeSpaced(col("tok"))) {
      case (acc, (a, b)) => bpeApply(acc, a, b)
    }
    spread(docs)
      .select(col("doc_id"), explode(normTokens(col("text"))).as("tok"))
      .select(col("doc_id"), size(split(trim(enc), " ")).cast("long").as("n_pc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens_norm"), sum(col("n_pc")).as("n_pieces"))
      .select(col("doc_id"), col("n_tokens_norm"), col("n_pieces"),
        round(col("n_pieces") / col("n_tokens_norm"), 4).as("pieces_per_token"))
  }

  /** Table-bound twin: train on the corpus, encode the same corpus --
    * the gate covers training AND encoding end to end. */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    bpeEncodeOf(d, bpeTrain(d))
  }

  /** The learned rule list itself as a queryable frame (rank, a, b,
    * merged) -- the model artifact a deployment persists. */
  def textBpeVocab(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val spark = s
    import spark.implicits._
    bpeTrain(d).zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b, a + b) }
      .toDF("rank", "a", "b", "merged")
  }

  /** The M training rounds unrolled as chained CTEs: per round a
    * pair-count CTE, a 1-row argmax CTE (cnt desc, pair asc), and the
    * vocab table with the winner applied -- regexp_replace with the
    * same spaced-literal pattern the engine uses, so the learned
    * rules (and every downstream piece count) match bit for bit. */
  private def bpeTrainCtes: String = {
    // MATERIALIZED is load-bearing: each round's scalar subqueries
    // reference m_k several times, and an inlining optimizer would
    // re-expand the whole prefix chain per reference -- exponential
    // plan growth across 12 rounds (observed as a file-handle
    // explosion). Materializing pins each round to one evaluation.
    def round(prev: String, k: Int): String =
      s"""p$k AS MATERIALIZED (
           SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
           FROM (SELECT string_split(trim(w), ' ') AS s, freq FROM $prev),
                unnest(range(1, len(s))) gs(i)
           GROUP BY 1, 2),
         m$k AS MATERIALIZED (SELECT a, b FROM p$k WHERE cnt >= 2
                 ORDER BY cnt DESC, a, b LIMIT 1),
         w$k AS MATERIALIZED (
           SELECT CASE WHEN (SELECT count(*) FROM m$k) = 0 THEN w
             ELSE regexp_replace(regexp_replace(w,
               ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
               ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ', 'g'),
               ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
               ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ', 'g')
             END AS w, freq
           FROM $prev)"""
    (1 to BpeMerges).map(k => round(s"w${k - 1}", k)).mkString(",\n")
  }

  val textBpeEncodeSql: String =
    s"""WITH toks AS MATERIALIZED (
         SELECT tok, count(*) AS freq
         FROM (SELECT unnest($NormTokensSql) AS tok FROM documents)
         GROUP BY 1),
       w0 AS MATERIALIZED (
         SELECT ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS w,
                freq
         FROM toks),
       $bpeTrainCtes,
       dt AS MATERIALIZED (SELECT doc_id, tok
              FROM (SELECT doc_id, unnest($NormTokensSql) AS tok FROM documents)),
       enc0 AS MATERIALIZED (SELECT doc_id,
                  ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS e
                FROM dt),
       ${(1 to BpeMerges).map(k =>
           s"""enc$k AS MATERIALIZED (SELECT doc_id,
              CASE WHEN (SELECT count(*) FROM m$k) = 0 THEN e
                ELSE regexp_replace(regexp_replace(e,
                  ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
                  ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ', 'g'),
                  ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
                  ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ', 'g')
                END AS e
              FROM enc${k - 1})""").mkString(",\n")}
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens_norm,
         CAST(sum(len(string_split(trim(e), ' '))) AS BIGINT) AS n_pieces,
         round(sum(len(string_split(trim(e), ' '))) / count(*), 4)
           AS pieces_per_token
       FROM enc$BpeMerges
       GROUP BY 1"""

  val textBpeVocabSql: String =
    s"""WITH toks AS MATERIALIZED (
         SELECT tok, count(*) AS freq
         FROM (SELECT unnest($NormTokensSql) AS tok FROM documents)
         GROUP BY 1),
       w0 AS MATERIALIZED (
         SELECT ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS w,
                freq
         FROM toks),
       $bpeTrainCtes
       ${(1 to BpeMerges).map(k =>
           s"""SELECT CAST($k AS BIGINT) AS rank, a, b, a || b AS merged
               FROM m$k""").mkString("\nUNION ALL ")}"""
}
