package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.ops.TextOps.TokensSql

/** Analytic extensions past the reference's own surface: framed
  * window functions (moving averages, lag returns -- the analytics an
  * equity warehouse's users run), vocabulary building, TF-IDF, and
  * per-cluster embedding centroids (the k-means/IVF building block).
  *
  * Determinism notes: moving sums go through decimal; centroid
  * averaging quantizes floats to 1e-6 longs first, because
  * double-sum order differs across engines AND across Spark shuffle
  * runs, while long sums are exact under any order.
  */
object AnalyticsQueries {
  private val D = DecimalType(18, 4)

  /** Framed window: 5-event trailing moving average per user. */
  def w2MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("ts_us"), col("value"),
      round(avg(col("value").cast(D)).over(w).cast("double"), 4).as("mavg_5"))
  }

  val w2MovingAvgSql: String =
    """SELECT user_id, event_id, ts_us, value,
       round(CAST(avg(CAST(value AS DECIMAL(18,4)))
         OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS mavg_5
       FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events)"""

  /** A11: volume-weighted average price (VWAP) per supplier-year --
    * the canonical execution-quality benchmark of an equity
    * warehouse, here as sum(notional)/sum(quantity) over lineitem
    * fills. Both sums run in decimal(18,4) (exact under any
    * partition order), the division happens once in doubles on the
    * already-exact sums -- the established cross-engine money-math
    * discipline (RelationalQueries header). Map-side-combinable
    * single aggregation; the two grouping columns prune the scan to
    * four columns. */
  def a11Vwap(s: SparkSession, dir: String): DataFrame = {
    val notional = sum(col("l_extendedprice").cast(D)).cast("double")
    val qty = sum(col("l_quantity").cast(D)).cast("double")
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"), year(col("l_shipdate")).cast("int").as("yr"))
      .agg(round(notional / qty, 4).as("vwap"),
        qty.as("total_qty"),
        count(lit(1)).as("n_fills"))
  }

  val a11VwapSql: String =
    """SELECT l_suppkey, CAST(year(l_shipdate) AS INT) AS yr,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS vwap,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
       count(*) AS n_fills
       FROM lineitem GROUP BY 1, 2"""

  /** A12: maximum drawdown per stream -- running peak via an
    * unbounded-preceding cummax frame (tie-broken on event_id so the
    * running sequence is engine-identical), per-row drawdown
    * (peak - value) / peak with the ANSI-safe zero-peak guard
    * (CASE -> NULL, max ignores nulls), then one max per user. All
    * double ops are fixed-shape IEEE expressions on identical
    * operands, so the result hash-matches without decimal detours. */
  def drawdownOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("value"),
        max(col("value")).over(w).as("peak"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(max(when(col("peak") =!= 0.0,
          (col("peak") - col("value")) / col("peak"))) * 100.0, 4)
          .as("max_dd_pct"))
  }

  def a12Drawdown(s: SparkSession, dir: String): DataFrame =
    drawdownOf(Tables.events(s, dir))

  val a12DrawdownSql: String =
    """WITH e AS (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events),
       p AS (SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id
                 ORDER BY ts_us ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
             FROM e)
       SELECT user_id, count(*) AS n_events,
              round(max(CASE WHEN peak <> 0 THEN (peak - value) / peak END)
                    * 100, 4) AS max_dd_pct
       FROM p GROUP BY user_id"""

  /** lag(): per-user delta vs previous event (daily-return shape). */
  def w3LagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("ts_us"), col("value"),
      round(col("value").cast(D) - lag(col("value").cast(D), 1).over(w), 4)
        .cast("double").as("delta_prev"))
  }

  val w3LagDeltaSql: String =
    """SELECT user_id, event_id, ts_us, value,
       CAST(round(CAST(value AS DECIMAL(18,4))
         - lag(CAST(value AS DECIMAL(18,4)), 1)
           OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC), 4)
         AS DOUBLE) AS delta_prev
       FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events)"""

  /** Vocabulary building: global top-20 tokens by frequency with a
    * deterministic tiebreak. */
  def textVocabTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(20)

  val textVocabTopkSql: String =
    s"""SELECT token, count(*) AS freq
       FROM (SELECT unnest($TokensSql) AS token FROM documents)
       GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20"""

  /** TF-IDF per (doc, token): tf * ln(N/df), exact integer tf/df so
    * only the final ln/round touches floats. The corpus size N rides
    * in as a broadcast 1-row aggregate (no plan-build-time count()
    * action: one fewer full scan and no driver synchronization). */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val termFreq = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = termFreq.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    termFreq.join(docFreq, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf"))
  }

  val textTfidfSql: String =
    s"""WITH tf AS (
         SELECT doc_id, token, count(*) AS tf
         FROM (SELECT doc_id, unnest($TokensSql) AS token FROM documents)
         GROUP BY 1, 2),
       df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n FROM documents)
       SELECT doc_id, tf.token, tf, df,
         round(tf * ln((SELECT CAST(n AS DOUBLE) FROM n) / df), 4) AS tfidf
       FROM tf JOIN df ON tf.token = df.token"""

  /** Per-label embedding centroids as flat (label, pos, centroid)
    * rows -- the coarse-quantizer build step of an IVF index. Floats
    * are quantized to 1e-6 longs before the order-sensitive sum. */
  def embCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(round(col("v").cast("double") * 1e6).cast("long")) /
        (count(lit(1)) * lit(1e6)), 6).as("centroid"))

  val embCentroidsSql: String =
    // fixed 64-dim vectors (driver tables); DuckDB 1.0 can't lateral-
    // parameterize generate_series with len(embedding)
    """SELECT label, CAST(i - 1 AS INT) AS pos,
       round(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT))
         / (count(*) * 1e6), 6) AS centroid
       FROM embeddings, generate_series(1, 64) gs(i)
       GROUP BY 1, 2"""

  /** Sessionization: per-user session ids from inactivity gaps > 1h
    * (lag + running sum of gap markers -- the standard shape). */
  def w4Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapMs = (col("ts_us") - lag(col("ts_us"), 1).over(byUser)) / 1000L
    val newSession = when(gapMs.isNull || gapMs > 3600 * 1000, 1L).otherwise(0L)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), newSession.as("is_new"))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("session_seq"))
  }

  val w4SessionizeSql: String =
    """SELECT user_id, event_id, ts_us,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       FROM (
         SELECT user_id, event_id, ts_us,
           CASE WHEN lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
                     IS NULL
                  OR (ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC))
                     / 1000 > 3600 * 1000
                THEN 1::BIGINT ELSE 0::BIGINT END AS is_new
         FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events))"""

  /** Exact interpolated percentiles per group -- Spark `percentile`
    * and DuckDB `quantile_cont` share the (n-1)p linear-interpolation
    * definition bit-for-bit (verified empirically). */
  def a4Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25, 0.5, 0.9, 0.99))").as("p"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        col("p")(0).as("p25"), col("p")(1).as("p50"),
        col("p")(2).as("p90"), col("p")(3).as("p99"))

  val a4PercentilesSql: String =
    """SELECT event_type, count(*) AS n,
       quantile_cont(value, 0.25) AS p25, quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99
       FROM events GROUP BY 1"""

  /** The 100 TB variant of [[a4Percentiles]]: approx_percentile
    * (KLL-style quantile sketch) -- bounded per-group state, map-side
    * combinable, vs exact percentile's full sorted collection per
    * group. Sketch values are not cross-engine reproducible, so the
    * raw values can't be hash-gated; the oracle entry is
    * [[a4PercentilesApproxGate]]. */
  def a4PercentilesApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.9, 0.99), 10000)").as("p"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        col("p")(0).as("p25"), col("p")(1).as("p50"),
        col("p")(2).as("p90"), col("p")(3).as("p99"))

  /** Quantitative oracle gate for [[a4PercentilesApprox]]: the sketch
    * value for quantile q must land inside the EXACT [q-0.01, q+0.01]
    * percentile band (rank-error framing -- approx_percentile returns
    * an actual data value near the requested rank, so the right bound
    * is a rank band, not a value-space epsilon; same bound the spec
    * asserts). Output is the exact group counts plus one boolean per
    * quantile, which the DuckDB oracle pins to TRUE -- an
    * out-of-bound sketch flips the hash red. The exact percentile
    * here exists only to gate the sketch; the production operator is
    * [[a4PercentilesApprox]] alone. */
  def a4PercentilesApproxGate(s: SparkSession, dir: String): DataFrame = {
    val inBand = (i: Int) =>
      col("p")(i) >= col("b")(2 * i) && col("p")(i) <= col("b")(2 * i + 1)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, array(0.24, 0.26, 0.49, 0.51, 0.89, 0.91, 0.98, 1.0))").as("b"),
        expr("approx_percentile(value, array(0.25, 0.5, 0.9, 0.99), 10000)").as("p"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        inBand(0).as("p25_in_band"), inBand(1).as("p50_in_band"),
        inBand(2).as("p90_in_band"), inBand(3).as("p99_in_band"))
  }

  val a4PercentilesApproxGateSql: String =
    """SELECT event_type, count(*) AS n,
       TRUE AS p25_in_band, TRUE AS p50_in_band,
       TRUE AS p90_in_band, TRUE AS p99_in_band
       FROM events GROUP BY 1"""

  /** Semi-structured extraction: JSON path into the `props` payload
    * column + aggregate over the extracted value. */
  def f16JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  val f16JsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY 1"""

  /** Star-schema referential-integrity audit: orphan and coverage
    * counts for every FK edge in one result -- the [[graft.quality
    * .ReferencedIn]] rule shape run across the whole schema. Each edge
    * is a broadcast left-anti join (dim key sets are dimension-sized
    * at any fact scale; facts never shuffle); the 6 per-edge scans are
    * independent and column-pruned to the key. */
  def qFkIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(label: String, fact: DataFrame, c: String,
        dim: DataFrame, k: String): DataFrame = {
      val checked = fact.filter(col(c).isNotNull)
      val orphans = checked
        .join(broadcast(dim.select(col(k).as("__k")).distinct()),
          col(c) === col("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      checked.agg(count(lit(1)).as("n_checked"))
        .crossJoin(orphans)
        .select(lit(label).as("fk"), col("n_orphans"), col("n_checked"))
    }
    Seq(
      edge("lineitem.l_orderkey", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      edge("lineitem.l_partkey", Tables.lineitem(s, dir), "l_partkey",
        Tables.part(s, dir), "p_partkey"),
      edge("lineitem.l_suppkey", Tables.lineitem(s, dir), "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey"),
      edge("orders.o_custkey", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      edge("customer.c_nationkey", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      edge("nation.n_regionkey", Tables.nation(s, dir), "n_regionkey",
        Tables.region(s, dir), "r_regionkey"),
    ).reduce(_ unionByName _)
  }

  val qFkIntegritySql: String = {
    def edge(label: String, fact: String, c: String,
        dim: String, k: String): String =
      s"""SELECT '$label' AS fk,
         (SELECT count(*) FROM $fact WHERE $c IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM $dim WHERE $k = $c)) AS n_orphans,
         (SELECT count(*) FROM $fact WHERE $c IS NOT NULL) AS n_checked"""
    Seq(
      edge("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.l_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders.o_custkey", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.c_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("nation.n_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ).mkString("\nUNION ALL\n")
  }

  /** NULL-semantics parity suite: the cross-engine traps -- NULL
    * grouping keys group together, count(col) skips NULLs, null-safe
    * equality (`<=>` / IS NOT DISTINCT FROM) matches NULL=NULL where
    * plain `=` never does, coalesce defaults inside decimal sums.
    * Keys are nullified deliberately (the generator emits no NULLs);
    * the pair counts ride a 1-row broadcast so the suite is one fact
    * aggregate + dim-sized joins. */
  def f17NullSemantics(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.orders(s, dir).select(
      expr("nullif(o_orderpriority, '1-URGENT')").as("k"),
      col("o_totalprice"))
    val grouped = keyed.groupBy(col("k")).agg(
      count(lit(1)).as("n_rows"),
      count(col("k")).as("n_nonnull_key"),
      sum(coalesce(col("o_totalprice").cast(D), lit(0).cast(D)))
        .cast("double").as("total"))
    val dims = keyed.select(col("k")).distinct()
    val pairCounts = dims.as("a")
      .join(dims.as("b"), col("a.k") <=> col("b.k")).agg(
        count(lit(1)).as("n_nullsafe_pairs"))
      .crossJoin(dims.as("c")
        .join(dims.as("d"), col("c.k") === col("d.k")).agg(
          count(lit(1)).as("n_eq_pairs")))
    grouped.crossJoin(broadcast(pairCounts))
  }

  val f17NullSemanticsSql: String =
    """WITH keyed AS (
         SELECT nullif(o_orderpriority, '1-URGENT') AS k, o_totalprice
         FROM orders),
       g AS (SELECT k, count(*) AS n_rows, count(k) AS n_nonnull_key,
               CAST(sum(coalesce(CAST(o_totalprice AS DECIMAL(18,4)),
                 CAST(0 AS DECIMAL(18,4)))) AS DOUBLE) AS total
             FROM keyed GROUP BY 1),
       dims AS (SELECT DISTINCT k FROM keyed),
       c AS (SELECT
         (SELECT count(*) FROM dims a JOIN dims b
            ON a.k IS NOT DISTINCT FROM b.k) AS n_nullsafe_pairs,
         (SELECT count(*) FROM dims a JOIN dims b ON a.k = b.k) AS n_eq_pairs)
       SELECT g.*, c.* FROM g CROSS JOIN c"""

  /** Calendar-arithmetic parity suite: month-end-clamping add_months,
    * last_day, month truncation, day diffs from an epoch anchor, ISO
    * day-of-week -- one narrow codegen projection over the scan (the
    * date functions a daily pipeline leans on, pinned cross-engine
    * including the Jan-31 + 1 month = Feb-end clamp). */
  def f19Dates(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_orderdate"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      last_day(col("o_orderdate")).as("month_end"),
      trunc(col("o_orderdate"), "month").as("month_start"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("days_since"),
      (weekday(col("o_orderdate")) + 1).as("iso_dow"))

  val f19DatesSql: String =
    """SELECT o_orderkey, o_orderdate,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
       last_day(o_orderdate) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT) AS days_since,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow
       FROM orders"""

  /** String-function parity suite: levenshtein (the fuzzy-match
    * primitive), regexp_extract groups, translate, lpad, reverse --
    * one narrow projection, every function pinned to its cross-engine
    * twin. */
  def f18Strings(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_orderpriority"),
      levenshtein(col("o_orderpriority"), lit("1-URGENT")).as("lev_urgent"),
      regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("prio_num"),
      translate(col("o_orderpriority"), "-", "_").as("translated"),
      lpad(col("o_orderstatus"), 4, "*").as("padded"),
      reverse(col("o_orderpriority")).as("reversed"))

  val f18StringsSql: String =
    """SELECT o_orderkey, o_orderpriority,
       CAST(levenshtein(o_orderpriority, '1-URGENT') AS INT) AS lev_urgent,
       regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
       translate(o_orderpriority, '-', '_') AS translated,
       lpad(o_orderstatus, 4, '*') AS padded,
       reverse(o_orderpriority) AS reversed
       FROM orders"""

  /** Hierarchical totals via ROLLUP (grouping sets): per (year,
    * priority), per year, and grand total in one pass. */
  def a5Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(year(col("o_orderdate")).as("yr"), col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("total_price"))

  val a5RollupSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS prio,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
       FROM orders GROUP BY ROLLUP (yr, prio)"""

  /** Z-score anomaly top-k: the 20 most anomalous event values
    * relative to their event_type's distribution -- the monitoring
    * query over any metric stream. Per-type mean (decimal-exact sum)
    * and stddev ride a broadcast 5-row table into a narrow scoring
    * projection; the cut is TakeOrderedAndProject on the ROUNDED
    * score with an id tiebreak, so last-ulp stddev differences
    * cannot reorder the output. At scale this is one map-side
    * combinable agg + one broadcast scan -- no shuffle of the
    * event stream. */
  def a8ZscoreTopk(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy(col("event_type")).agg(
      (sum(col("value").cast(D)).cast("double") / count(lit(1))).as("mean_v"),
      stddev_samp(col("value")).as("sd_v"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean_v")) / col("sd_v"), 4).as("z"))
      .orderBy(abs(col("z")).desc, col("event_id").asc)
      .limit(20)
  }

  val a8ZscoreTopkSql: String =
    """WITH st AS (SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean_v,
         stddev_samp(value) AS sd_v
         FROM events GROUP BY 1)
       SELECT event_id, e.event_type, value,
         round((value - mean_v) / sd_v, 4) AS z
       FROM events e JOIN st ON e.event_type = st.event_type
       ORDER BY abs(round((value - mean_v) / sd_v, 4)) DESC, event_id ASC
       LIMIT 20"""

  /** Correlation / covariance profiling: per returnflag, the
    * co-movement of quantity and price columns -- the feature-
    * correlation pass of dataset profiling. Both engines accumulate
    * co-moments in merge order, so (like a3's stddev) the outputs are
    * pinned at 4 decimals, far above the co-moment merge noise. */
  def a10CorrStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))

  val a10CorrStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
       FROM lineitem GROUP BY 1"""

  /** Ranking-function suite: rank / dense_rank / percent_rank /
    * cume_dist / ntile over one (type, value) ordering -- the ranking
    * window classes in a single pass. The ORDER BY carries event_id
    * so the order is total: rank ties (and therefore every rank
    * family value) are identical cross-engine. percent_rank and
    * cume_dist are exact small-integer ratios -- bit-stable doubles. */
  def w9RankSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    Tables.events(s, dir).select(
      col("event_type"), col("event_id"), col("value"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      round(percent_rank().over(w), 6).as("prnk"),
      round(cume_dist().over(w), 6).as("cdist"),
      ntile(10).over(w).as("decile"))
  }

  val w9RankSuiteSql: String =
    """SELECT event_type, event_id, value,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 6) AS prnk,
       round(cume_dist() OVER w, 6) AS cdist,
       CAST(ntile(10) OVER w AS INT) AS decile
       FROM events
       WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)"""

  /** Skew-safe agg twin of [[w9RankSuite]]: the identical rank-family
    * output with NO table-sized window partition (w9's
    * PARTITION BY event_type puts an entire type -- 1/5 of the corpus
    * here, unbounded at 100 TB -- into one task's sort).
    *
    * Shape: range-bucket then offset. A broadcast per-type
    * (min, max, count) row assigns every event an equal-width value
    * bin whose index ASCENDS as value DESCENDS, so bin order IS rank
    * order; row_number runs per (type, bin) -- each window partition
    * is ~1/bins of a type under any value distribution short of a
    * single repeated point; and a tiny (type, bin) count table,
    * cumulated over its <= bins rows and broadcast back, converts
    * local row numbers to exact global ranks. Three narrow scans of
    * nothing table-sized; the only per-row shuffle is the bounded
    * window's.
    *
    * Rank-family algebra (why one row_number suffices): the ORDER BY
    * key (value DESC, event_id ASC) is total, so rank and dense_rank
    * both equal row_number, percent_rank = (rnk-1)/(n-1), cume_dist =
    * rnk/n, and ntile(k) is the standard first-(n%k)-tiles-bigger
    * formula -- all exact integer/single-division arithmetic off the
    * broadcast per-type count n. Hash-matched against the SAME oracle
    * SQL as w9_rank_suite, which computes the real window functions:
    * the match proves the algebra. */
  def w9RankAgg(s: SparkSession, dir: String): DataFrame =
    rankSuiteOf(Tables.events(s, dir), bins = 256)

  /** [[w9RankAgg]] over any (event_type, event_id, value) frame. */
  def rankSuiteOf(ev0: DataFrame, bins: Int): DataFrame = {
    val ev = ev0.select(col("event_type"), col("event_id"), col("value"))
    val bounds = ev.groupBy(col("event_type")).agg(
      min(col("value")).as("__lo"), max(col("value")).as("__hi"),
      count(lit(1)).as("__n"))
    // bin 0 holds the LARGEST values: ascending (bin, value DESC,
    // event_id) equals the suite's total order. Degenerate one-value
    // types collapse to bin 0; the clamp keeps value == hi in-range.
    val binned = ev.join(broadcast(bounds), "event_type")
      .withColumn("__bin",
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          lit(bins - 1) - least(lit(bins - 1),
            floor((col("value") - col("__lo")) * bins /
              (col("__hi") - col("__lo"))).cast("int"))))
    val perBin = binned.groupBy(col("event_type"), col("__bin"))
      .agg(count(lit(1)).as("__bn"))
    // cumulative rows BEFORE each bin: a window over <= `bins` rows
    // per type (aggregate-bounded input -- the PlanAudit-exempt kind)
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("__bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBin.withColumn("__off",
      coalesce(sum(col("__bn")).over(wOff), lit(0L))).drop("__bn")
    val wLocal = Window.partitionBy(col("event_type"), col("__bin"))
      .orderBy(col("value").desc, col("event_id").asc)
    val ranked = binned
      .withColumn("__lr", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("event_type", "__bin"))
      .withColumn("__rnk", col("__off") + col("__lr"))
    // ntile(k): n%k leading tiles of size n/k+1, the rest n/k. When
    // n < k the big-tile branch covers every row (sz = 0 never
    // divides). Integer math throughout -- no float tile edges.
    val k = 10
    val sz = (col("__n") / k).cast("long")
    val big = (col("__n") % k).cast("long")
    val inBig = col("__rnk") <= big * (sz + lit(1L))
    val decile = when(inBig, (col("__rnk") - 1) / (sz + lit(1L)))
      .otherwise(big + (col("__rnk") - lit(1L) - big * (sz + lit(1L))) / sz)
    ranked.select(
      col("event_type"), col("event_id"), col("value"),
      col("__rnk").cast("int").as("rnk"),
      col("__rnk").cast("int").as("drnk"),
      round(when(col("__n") === 1, lit(0.0)).otherwise(
        (col("__rnk") - lit(1L)).cast("double") /
          (col("__n") - lit(1L)).cast("double")), 6).as("prnk"),
      round(col("__rnk").cast("double") / col("__n").cast("double"), 6)
        .as("cdist"),
      (decile + lit(1L)).cast("int").as("decile"))
  }

  /** Equi-width histogram: per event_type, value counts over 10 equal
    * bins spanning the GLOBAL [min, max] -- the data-profiling
    * histogram. Bounds ride a broadcast 1-row aggregate; bin
    * assignment is one arithmetic projection (floor of the scaled
    * offset, top value clamped into the last bin); the final count
    * groups on a tiny (type, bin) key. Identical IEEE arithmetic on
    * both engines keeps bin edges bit-stable. */
  def a9Histogram(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        least(lit(9), floor((col("value") - col("lo")) * 10.0 /
          (col("hi") - col("lo")))).cast("int").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  val a9HistogramSql: String =
    """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
       SELECT event_type,
         CAST(least(9, floor((value - lo) * 10.0 / (hi - lo))) AS INT) AS bin,
         count(*) AS n
       FROM events CROSS JOIN b
       GROUP BY 1, 2"""

  /** Median absolute deviation: the robust dispersion twin of
    * stddev (a 50%-breakdown estimator -- one corrupt feed cannot
    * move it, where variance chases the outlier). Two exact-median
    * aggregates with a broadcast join between them: per-type median,
    * then the median of |value - median|; both group-sized outputs.
    * At 100 TB each median swaps for approx_percentile with the same
    * two-agg shape (a4's documented trade). */
  def a15Mad(s: SparkSession, dir: String): DataFrame =
    madOf(Tables.events(s, dir))

  /** [[a15Mad]] over any (event_type, value) frame. */
  def madOf(ev: DataFrame): DataFrame = {
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"), count(lit(1)).as("n"))
    ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
        min(col("med")).as("med"), min(col("n")).as("n"))
      .select(col("event_type"), col("n"), col("med"), col("mad"))
  }

  val a15MadSql: String =
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med,
         count(*) AS n FROM events GROUP BY 1)
       SELECT event_type, n, med,
         quantile_cont(abs(value - med), 0.5) AS mad
       FROM events JOIN m USING (event_type) GROUP BY 1, 2, 3"""

  /** Production (100 TB) twin of [[a15Mad]]: both medians via
    * approx_percentile (bounded KLL sketch state, map-side combinable)
    * instead of exact percentile's full per-group sorted collection --
    * identical two-agg broadcast shape, so swapping is a one-word
    * change. Benched under the same name ([[benchOverrides]]); the
    * exact twin stays the oracle gate. */
  def a15MadApprox(s: SparkSession, dir: String): DataFrame =
    madApproxOf(Tables.events(s, dir))

  def madApproxOf(ev: DataFrame): DataFrame = {
    val med = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("med"),
        count(lit(1)).as("n"))
    ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(abs(value - med), 0.5, 10000)").as("mad"),
        min(col("med")).as("med"), min(col("n")).as("n"))
      .select(col("event_type"), col("n"), col("med"), col("mad"))
  }

  /** Production twin of [[a13Winsorize]]: approx_percentile clip
    * bounds, same broadcast-clamp shape ([[benchOverrides]]). */
  def a13WinsorizeApprox(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.01, 0.99), 10000)").as("b"))
      .select(col("event_type"), col("b")(0).as("lo"), col("b")(1).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(least(greatest(col("value"), col("lo")), col("hi")).cast(D))
          .cast("double").as("w_sum"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .withColumn("w_mean", round(col("w_sum") / col("n"), 4))
  }

  /** Conditional-aggregate suite: count_if / bool_and / bool_or and a
    * FILTER-ed decimal sum -- the predicate-inside-the-aggregate
    * family (one pass computes every conditional metric; the naive
    * twin is N filtered scans). All map-side combinable. */
  def f20CondAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      count_if(col("l_quantity") > 25).as("n_heavy"),
      bool_and(col("l_discount") <= 0.05).as("all_low_disc"),
      bool_or(col("l_tax") > 0.07).as("any_high_tax"),
      sum(when(col("l_linestatus") === "F", col("l_quantity").cast(D)))
        .cast("double").as("qty_f"))

  val f20CondAggSql: String =
    """SELECT l_returnflag,
       CAST(count(*) FILTER (l_quantity > 25) AS BIGINT) AS n_heavy,
       bool_and(l_discount <= 0.05) AS all_low_disc,
       bool_or(l_tax > 0.07) AS any_high_tax,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
         FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_f
       FROM lineitem GROUP BY 1"""

  /** Explicit GROUPING SETS with grouping_id: per-year totals and
    * per-priority totals in ONE pass over the facts -- the two
    * independent rollup axes a dashboard wants, without the cross
    * combinations CUBE would add (and a quarter of its Expand width).
    * grouping_id disambiguates which axis a row belongs to (NULL key
    * vs NULL-from-grouping, the classic trap). */
  def a14GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("yr"),
        col("o_orderpriority").as("prio"),
        col("o_totalprice"))
    o.createOrReplaceTempView("graft_a14_orders")
    s.sql(s"""SELECT yr, prio, CAST(grouping_id(yr, prio) AS INT) AS gid,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM graft_a14_orders
      GROUP BY GROUPING SETS ((yr), (prio))""")
  }

  val a14GroupingSetsSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS prio,
       CAST(grouping(yr) * 2 + grouping(prio) AS INT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
       FROM orders GROUP BY GROUPING SETS ((yr), (prio))"""

  /** CUBE grouping sets: all 4 (year x status) grouping combinations
    * in one pass -- the full-lattice twin of [[a5Rollup]]'s hierarchy. */
  def a7Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(year(col("o_orderdate")).as("yr"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("total_price"))

  val a7CubeSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus AS status,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
       FROM orders GROUP BY CUBE (yr, status)"""

  /** RANGE-frame window: per user, the trailing-24h value sum keyed
    * by event-time DISTANCE, not row count -- the frame class [[w2MovingAvg]]'s
    * ROWS frame can't express. RANGE frames treat timestamp peers
    * identically by definition, so the result is total-order-free
    * deterministic; the decimal sum keeps it order-exact cross-engine. */
  def w8RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-dayUs, Window.currentRow)
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("ts_us"),
      sum(col("value").cast(D)).over(w).cast("double").as("sum_24h"))
  }

  val w8RangeFrameSql: String =
    """SELECT user_id, event_id, ts_us,
       CAST(sum(CAST(value AS DECIMAL(18,4)))
         OVER (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS sum_24h
       FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events)"""

  /** Pivot: events wide per user over event_type counts. The oracle
    * expresses the same thing as conditional aggregation. */
  def a6Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val a6PivotSql: String =
    """SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
       FROM events GROUP BY user_id"""

  /** As-of join: each click event picks the latest purchase (same
    * user) at-or-before its timestamp -- the canonical time-series
    * enrichment. Composed from existing operators (preference (a) of
    * the custom-op ladder): union the two sides, carry the last
    * non-null right value forward within a (ts, side) ordered window,
    * keep left rows. One shuffle on the key, no range-join blowup --
    * the same plan holds at any scale because the window is a single
    * ordered pass per key partition.
    *
    * Right side is deduped to one row per (user, ts) first so the
    * at-same-timestamp winner is well-defined in both engines. */
  def j4AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val right = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max_by(col("value"), col("event_id")).as("px"))
    val left = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val tagged = right.select(col("user_id"), col("ts_us"),
        lit(null).cast("long").as("event_id"), col("px"), lit(1).as("is_right"))
      .unionByName(left.select(col("user_id"), col("ts_us"), col("event_id"),
        lit(null).cast("double").as("px"), lit(0).as("is_right")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("is_right").desc, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_px", last(col("px"), ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("asof_px"))
  }

  val j4AsofJoinSql: String =
    """WITH r AS (
         SELECT user_id, ts_us, arg_max(value, event_id) AS px
         FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us FROM events)
         WHERE event_type = 'purchase' GROUP BY 1, 2),
       l AS (
         SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us
         FROM events WHERE event_type = 'click')
       SELECT l.user_id, l.event_id, l.ts_us, r.px AS asof_px
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.ts_us >= r.ts_us"""

  /** Interval length for [[j5RangeJoin]] windows: 5 minutes in us. */
  val RangeWindowUs: Long = 300L * 1000 * 1000

  /** Keyless range (interval) join: every error event opens a 5-minute
    * incident window; count the events (and distinct users) falling in
    * each window. With no equi key, Spark's naive plan for an interval
    * predicate is BroadcastNestedLoopJoin (or worse, a cartesian) --
    * quadratic and non-viable at scale. The scale shape used here is
    * the bucket-explode equi-join: discretize time into buckets the
    * size of the interval, explode each window to the (exactly 2)
    * buckets it can overlap, tag each event with its single bucket,
    * equi-join on the bucket, and apply the exact containment filter
    * inside the join. Each qualifying (window, event) pair matches on
    * exactly one bucket -- the event side has one bucket value -- so
    * no DISTINCT pass is needed. The shuffle key is the time bucket;
    * time buckets are load-uniform unless the stream spikes -- for a
    * spiky stream pass `saltG > 1`: the window side is replicated
    * G ways and each point lands in ONE hash-salt group, so a hot
    * bucket's points split across G reducers (same salting the LSH
    * joins use) at the cost of a G-times-wider window side. The salt
    * never changes which (window, event) pairs meet -- a point meets
    * every window replica group exactly once via its own salt -- so
    * the result is hash-identical to the unsalted plan (pinned by
    * spec against a planted hot bucket). Default G=1 (the driver's
    * uniform events table has no skew; salt column and key are
    * omitted entirely, keeping the unsalted plan byte-identical). */
  def j5RangeJoinOf(ev: DataFrame, saltG: Int = 1): DataFrame = {
    require(saltG >= 1, s"saltG must be >= 1, got $saltG")
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts_us").as("lo"),
        (col("ts_us") + RangeWindowUs).as("hi"))
      .withColumn("bucket", explode(array(
        expr(s"lo DIV $RangeWindowUs"), expr(s"lo DIV $RangeWindowUs + 1"))))
    val pts = ev.select(col("event_id"), col("user_id"), col("ts_us"),
      expr(s"ts_us DIV $RangeWindowUs").as("bucket"))
    val (winsK, ptsK, joinKeys) =
      if (saltG == 1) (wins, pts, Seq("bucket"))
      else (
        wins.withColumn("salt",
          explode(array((0 until saltG).map(g => lit(g.toLong)): _*))),
        // salt by event id hash: uniform over points, independent of
        // the time bucket, so the hot bucket splits G ways
        pts.withColumn("salt", pmod(xxhash64(col("event_id")), lit(saltG.toLong))),
        Seq("bucket", "salt"))
    winsK.join(ptsK, joinKeys)
      .filter(col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
  }

  def j5RangeJoin(s: SparkSession, dir: String): DataFrame =
    j5RangeJoinOf(Tables.events(s, dir))

  val j5RangeJoinSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
           epoch_ns(ts)//1000 AS ts_us FROM events),
       w AS (SELECT event_id AS window_id, ts_us AS lo,
           ts_us + $RangeWindowUs AS hi FROM e WHERE event_type = 'error')
       SELECT window_id, count(*) AS n_events,
         count(DISTINCT e.user_id) AS n_users
       FROM w JOIN e ON e.ts_us >= w.lo AND e.ts_us < w.hi
       GROUP BY 1"""

  /** Cohort retention: users bucketed by first-seen day; for each
    * (cohort day, day offset) the count of distinct users still
    * active. First-seen rides a per-user window min (one shuffle on
    * user_id, no self-join), then one agg shuffle on the tiny
    * (cohort, offset) key space. Days are integer us-epoch divisions
    * -- timezone-free in both engines -- converted to DATE only at
    * the output edge. */
  def w6RetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    val wu = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us DIV $dayUs").as("day_n"))
      .withColumn("cohort_n", min(col("day_n")).over(wu))
      .groupBy(col("cohort_n"),
        (col("day_n") - col("cohort_n")).cast("int").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .select(
        date_add(to_date(lit("1970-01-01")), col("cohort_n").cast("int"))
          .as("cohort_day"),
        col("day_offset"), col("n_users"))
  }

  val w6RetentionCohortSql: String =
    """WITH d AS (SELECT user_id,
           (epoch_ns(ts)//1000) // 86400000000 AS day_n FROM events),
       c AS (SELECT user_id, day_n,
           min(day_n) OVER (PARTITION BY user_id) AS cohort_n FROM d)
       SELECT DATE '1970-01-01' + CAST(cohort_n AS INT) AS cohort_day,
         CAST(day_n - cohort_n AS INT) AS day_offset,
         count(DISTINCT user_id) AS n_users
       FROM c GROUP BY 1, 2"""

  /** Native session windows: the same 1-hour-gap sessionization as
    * [[w4Sessionize]] but through `session_window` -- Spark's
    * dynamic-gap merging-session operator (MergingSessionsExec), the
    * form that also runs under Structured Streaming with state.
    * Boundary semantics: session_window splits at gap >= 1h (the
    * window extends to last+gap, half-open), so the oracle mirrors
    * ">=", where w4's lag rule is ">". Output pins session bounds to
    * min/max event time (the window struct's end is last+gap -- an
    * engine artifact, not data). */
  def w5SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))

  val w5SessionWindowSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
       m AS (SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w >= 3600000000
              THEN 1 ELSE 0 END AS is_new
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
       s AS (SELECT user_id, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM m)
       SELECT user_id, min(ts_us) AS session_start_us,
         max(ts_us) AS session_end_us, count(*) AS n_events
       FROM s GROUP BY user_id, sid"""

  /** Ordered conversion funnel: per user, the first view, the first
    * click strictly AFTER that view, and the first purchase strictly
    * after that click -- stage = how deep the ordered sequence got
    * (sequence order enforced, not mere presence). Three per-stage
    * min-aggregates chained on user_id: after the first shuffle every
    * stage is co-partitioned on the key, so the chain adds no extra
    * exchanges of the event stream -- only tiny per-user timestamp
    * tables join forward. */
  def w7Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_type"), col("ts_us"))
    // per-stage tables are one timestamp per user -- materialized so
    // the stage-n aggregate isn't recomputed by both its consumers
    // (the next stage's join AND the final assembly)
    val v = graft.ops.DedupOps.materializeOnce(
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view")))
    val c = graft.ops.DedupOps.materializeOnce(
      e.filter(col("event_type") === "click").join(v, Seq("user_id"))
        .filter(col("ts_us") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click")))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("ts_us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast("int").as("funnel_stage"))
  }

  val w7FunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS ts_us
           FROM events),
       v AS (SELECT user_id, min(ts_us) AS t_view FROM e
             WHERE event_type = 'view' GROUP BY 1),
       c AS (SELECT e.user_id, min(e.ts_us) AS t_click
             FROM e JOIN v ON e.user_id = v.user_id AND e.ts_us > v.t_view
             WHERE e.event_type = 'click' GROUP BY 1),
       p AS (SELECT e.user_id, min(e.ts_us) AS t_purchase
             FROM e JOIN c ON e.user_id = c.user_id AND e.ts_us > c.t_click
             WHERE e.event_type = 'purchase' GROUP BY 1)
       SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
         CAST(1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS INT)
           AS funnel_stage
       FROM v LEFT JOIN c ON v.user_id = c.user_id
              LEFT JOIN p ON v.user_id = p.user_id"""

  /** BM25 parameters (Okapi defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Okapi BM25 relevance score per (doc, token) -- the ranking
    * function under lexical retrieval. Same skeleton as [[textTfidf]]
    * (exact integer tf/df so only the final float formula diverges)
    * plus the doc-length normalization: dl rides THROUGH the tf
    * groupBy key (it is functionally dependent on doc_id), so no
    * extra per-doc join or shuffle is added; corpus stats (N, total
    * length) ride in as one broadcast row. idf is the +1 smoothed
    * variant, non-negative for df near N. */
  def bm25(docs: DataFrame): DataFrame = {
    // tokenize ONCE: tf is materialized, then df, the corpus stats,
    // and the final join all read it -- without this the stats
    // aggregate re-tokenizes the whole corpus a second time (split()
    // never yields an empty array, so every doc appears in tf and
    // count_distinct(doc_id) == corpus size)
    val tf = graft.ops.DedupOps.materializeOnce(docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = tf.agg(
      count_distinct(col("doc_id")).cast("double").as("n_docs"),
      sum(col("tf")).cast("double").as("sum_dl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(Bm25K1) *
      (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / (col("sum_dl") / col("n_docs")))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"), col("df"),
        round(idf * (col("tf") * lit(Bm25K1 + 1)) / denom, 4).as("bm25"))
  }

  def textBm25(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(s, dir))

  val textBm25Sql: String =
    s"""WITH tok AS (SELECT doc_id, CAST(len($TokensSql) AS BIGINT) AS dl,
           unnest($TokensSql) AS token FROM documents),
       tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
       df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           CAST(sum(CAST(len($TokensSql) AS BIGINT)) AS DOUBLE) AS sum_dl
           FROM documents)
       SELECT doc_id, tf.token, tf, dl, df,
         round(ln(CAST(1.0 AS DOUBLE)
             + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
           * (tf * (CAST($Bm25K1 AS DOUBLE) + 1))
           / (tf + CAST($Bm25K1 AS DOUBLE) * (CAST(${1.0 - Bm25B} AS DOUBLE)
              + CAST($Bm25B AS DOUBLE) * dl / (sum_dl / n_docs))), 4) AS bm25
       FROM tf JOIN df ON tf.token = df.token CROSS JOIN st"""

  /** Set operators: customers active in both 1995 and 1996, minus
    * those active in 1998 (INTERSECT / EXCEPT, distinct semantics). */
  def u1SetOps(s: SparkSession, dir: String): DataFrame = {
    def activeIn(yr: Int) = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()
    activeIn(1995).intersect(activeIn(1996)).except(activeIn(1998))
  }

  val u1SetOpsSql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
       INTERSECT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
       EXCEPT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998"""

  /** Set operators under BAG (multiset) semantics -- `INTERSECT ALL`
    * keeps min(n_left, n_right) copies of each value, `EXCEPT ALL`
    * subtracts multiplicities -- the row-accounting twin of [[u1SetOps]]
    * (reconciliation workloads need the copies: "how many 1995
    * shipments does 1996 match, shipment for shipment"). Spark plans
    * both as one count-aggregate per side (map-side combinable) + a
    * key join + replicate -- the value key is the only shuffle, never
    * a distinct-then-rejoin of raw rows. */
  def u2BagOps(s: SparkSession, dir: String): DataFrame = {
    def shippedIn(yr: Int) = Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")) === yr)
      .select(col("l_suppkey"))
    shippedIn(1995).intersectAll(shippedIn(1996)).exceptAll(shippedIn(1994))
  }

  // standard precedence: INTERSECT binds tighter than EXCEPT, so the
  // SQL reads as (1995 INTERSECT ALL 1996) EXCEPT ALL 1994 -- the
  // same association as the Scala chain
  val u2BagOpsSql: String =
    """SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1995
       INTERSECT ALL
       SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1996
       EXCEPT ALL
       SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1994"""

  /** Winsorized (outlier-clipped) robust statistics: per event_type,
    * clamp values into the exact [p01, p99] band and report clip
    * counts + the clipped sum/mean -- the standard robust-metric
    * pre-step before any mean-based monitoring (a single corrupt
    * reading stops moving the aggregate). Bounds are ONE exact
    * percentile aggregate (group-sized output) broadcast back into a
    * narrow clamp projection; the event stream shuffles once for each
    * aggregate and never sorts globally. clamp is pure comparison
    * (no arithmetic), so doubles stay bit-identical cross-engine; the
    * clipped sum rides decimal(18,4) like every money sum here. */
  def a13Winsorize(s: SparkSession, dir: String): DataFrame =
    winsorizeOf(Tables.events(s, dir))

  /** [[a13Winsorize]] over any (event_type, value) frame. */
  def winsorizeOf(ev: DataFrame): DataFrame = {
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.01, 0.99))").as("b"))
      .select(col("event_type"), col("b")(0).as("lo"), col("b")(1).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(least(greatest(col("value"), col("lo")), col("hi")).cast(D))
          .cast("double").as("w_sum"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .withColumn("w_mean", round(col("w_sum") / col("n"), 4))
  }

  val a13WinsorizeSql: String =
    """WITH b AS (SELECT event_type,
         quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
       FROM events GROUP BY 1)
       SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
         CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
         CAST(sum(CAST(least(greatest(value, lo), hi) AS DECIMAL(18,4))) AS DOUBLE) AS w_sum,
         min(lo) AS lo, max(hi) AS hi,
         round(CAST(sum(CAST(least(greatest(value, lo), hi) AS DECIMAL(18,4))) AS DOUBLE)
           / count(*), 4) AS w_mean
       FROM events JOIN b USING (event_type) GROUP BY 1"""

  /** ANALYZE-style column statistics (count / nulls / exact NDV /
    * min / max) for optimizer-feeding metadata -- one scan computes
    * all columns' stats, then unpivots. */
  def s15TableStats(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__cnt, ${c}__ndv, ${c}__min, ${c}__max"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(expr(s"$stackExpr AS (column_name, cnt, ndv, min_v, max_v)"))
  }

  /** The 100 TB variant of [[s15TableStats]]: NDV via
    * approx_count_distinct (HyperLogLog++, rsd 2%). Exact NDV is a
    * full shuffle per column (the single agg expands the input
    * ncols+1 ways); the sketch is map-side combinable with constant
    * state per column, so the whole stats pass stays one narrow scan
    * at any scale. HLL estimates are not cross-engine reproducible,
    * so the raw values can't be hash-gated; the oracle entry is
    * [[s15TableStatsApproxGate]]. */
  def s15TableStatsApprox(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        approx_count_distinct(col(c), 0.02).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__cnt, ${c}__ndv, ${c}__min, ${c}__max"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(expr(s"$stackExpr AS (column_name, cnt, ndv, min_v, max_v)"))
  }

  /** Quantitative oracle gate for [[s15TableStatsApprox]]: the HLL
    * NDV must track the exact NDV within max(5, 10% of exact) -- a
    * 5-sigma guard band at rsd 2%, the same bound the spec asserts.
    * cnt/min/max stay exact; the sketched NDV becomes a boolean the
    * DuckDB oracle pins to TRUE, so estimator drift flips the hash
    * red. The exact count_distinct here exists only to gate the
    * sketch; the production operator is [[s15TableStatsApprox]]
    * alone. */
  def s15TableStatsApproxGate(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      val exact = count_distinct(col(c))
      val sketch = approx_count_distinct(col(c), 0.02)
      Seq(count(col(c)).as(s"${c}__cnt"),
        (abs(sketch - exact).cast("double") <=
          greatest(lit(5.0), exact.cast("double") * 0.10)).as(s"${c}__ok"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__cnt, ${c}__ok, ${c}__min, ${c}__max"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(expr(s"$stackExpr AS (column_name, cnt, ndv_in_band, min_v, max_v)"))
  }

  val s15TableStatsApproxGateSql: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS cnt, TRUE AS ndv_in_band,
         CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
         FROM lineitem"""
    }.mkString("\nUNION ALL\n")
  }

  val s15TableStatsSql: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS cnt,
         count(DISTINCT $c) AS ndv,
         CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
         FROM lineitem"""
    }.mkString("\nUNION ALL\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15_table_stats" -> (s15TableStats _),
    "s15_table_stats_approx" -> (s15TableStatsApproxGate _),
    "u1_set_ops" -> (u1SetOps _),
    "u2_bag_ops" -> (u2BagOps _),
    "a13_winsorize" -> (a13Winsorize _),
    "a14_grouping_sets" -> (a14GroupingSets _),
    "a15_mad" -> (a15Mad _),
    "j4_asof_join" -> (j4AsofJoin _),
    "j5_range_join" -> (j5RangeJoin _),
    "w6_retention_cohort" -> (w6RetentionCohort _),
    "w5_session_window" -> (w5SessionWindow _),
    "w7_funnel" -> (w7Funnel _),
    "text_bm25" -> (textBm25 _),
    "a5_rollup" -> (a5Rollup _),
    "a6_pivot" -> (a6Pivot _),
    "a7_cube" -> (a7Cube _),
    "a8_zscore_topk" -> (a8ZscoreTopk _),
    "a9_histogram" -> (a9Histogram _),
    "a10_corr_stats" -> (a10CorrStats _),
    "a11_vwap" -> (a11Vwap _),
    "a12_drawdown" -> (a12Drawdown _),
    "w8_range_frame" -> (w8RangeFrame _),
    "w9_rank_suite" -> (w9RankSuite _),
    "w9_rank_agg" -> (w9RankAgg _),
    "f16_json_extract" -> (f16JsonExtract _),
    "f17_null_semantics" -> (f17NullSemantics _),
    "f18_strings" -> (f18Strings _),
    "f19_dates" -> (f19Dates _),
    "f20_cond_agg" -> (f20CondAgg _),
    "q_fk_integrity" -> (qFkIntegrity _),
    "a4_percentiles" -> (a4Percentiles _),
    "a4_percentiles_approx" -> (a4PercentilesApproxGate _),
    "w4_sessionize" -> (w4Sessionize _),
    "w2_moving_avg" -> (w2MovingAvg _),
    "w3_lag_delta" -> (w3LagDelta _),
    "text_vocab_topk" -> (textVocabTopk _),
    "text_tfidf" -> (textTfidf _),
    "emb_centroids" -> (embCentroids _),
  )

  /** Bench measures the production sketch operators, not the
    * exact-computing tolerance gates (see SparkEntry.benchOverrides). */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15_table_stats_approx" -> (s15TableStatsApprox _),
    "a4_percentiles_approx" -> (a4PercentilesApprox _),
    "p13_curriculum_bins" -> (graft.ops.SamplingOps.curriculumBins _),
    "a13_winsorize" -> (a13WinsorizeApprox _),
    "a15_mad" -> (a15MadApprox _),
  )

  val oracleSql: Map[String, String] = Map(
    "s15_table_stats" -> s15TableStatsSql,
    "s15_table_stats_approx" -> s15TableStatsApproxGateSql,
    "a4_percentiles_approx" -> a4PercentilesApproxGateSql,
    "u1_set_ops" -> u1SetOpsSql,
    "u2_bag_ops" -> u2BagOpsSql,
    "a13_winsorize" -> a13WinsorizeSql,
    "a14_grouping_sets" -> a14GroupingSetsSql,
    "a15_mad" -> a15MadSql,
    "j4_asof_join" -> j4AsofJoinSql,
    "j5_range_join" -> j5RangeJoinSql,
    "w6_retention_cohort" -> w6RetentionCohortSql,
    "w5_session_window" -> w5SessionWindowSql,
    "w7_funnel" -> w7FunnelSql,
    "text_bm25" -> textBm25Sql,
    "a5_rollup" -> a5RollupSql,
    "a6_pivot" -> a6PivotSql,
    "a7_cube" -> a7CubeSql,
    "a8_zscore_topk" -> a8ZscoreTopkSql,
    "a9_histogram" -> a9HistogramSql,
    "a10_corr_stats" -> a10CorrStatsSql,
    "a11_vwap" -> a11VwapSql,
    "a12_drawdown" -> a12DrawdownSql,
    "w8_range_frame" -> w8RangeFrameSql,
    "w9_rank_suite" -> w9RankSuiteSql,
    "w9_rank_agg" -> w9RankSuiteSql,
    "f16_json_extract" -> f16JsonExtractSql,
    "f17_null_semantics" -> f17NullSemanticsSql,
    "f18_strings" -> f18StringsSql,
    "f19_dates" -> f19DatesSql,
    "f20_cond_agg" -> f20CondAggSql,
    "q_fk_integrity" -> qFkIntegritySql,
    "a4_percentiles" -> a4PercentilesSql,
    "w4_sessionize" -> w4SessionizeSql,
    "w2_moving_avg" -> w2MovingAvgSql,
    "w3_lag_delta" -> w3LagDeltaSql,
    "text_vocab_topk" -> textVocabTopkSql,
    "text_tfidf" -> textTfidfSql,
    "emb_centroids" -> embCentroidsSql,
  )
}
