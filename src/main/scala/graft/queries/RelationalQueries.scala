package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

import graft.core.Tables

/** Reference-parity relational operators (SURVEY.md S2), each expressed
  * as a declarative DataFrame query over the driver's synthetic tables
  * so the DuckDB oracle can check it.
  *
  * Query names carry the SURVEY S2 operator ids (s1, p6, w1, j1, a1, ...)
  * so coverage is line-by-line traceable.
  *
  * Cross-engine determinism rules (SURVEY S7.5):
  *  - SUM over doubles goes through DECIMAL(18,4) then back to double:
  *    exact arithmetic -> bit-identical across engines.
  *  - AVG = decimal-sum cast double / count (identical double division).
  *  - STDDEV is rounded to 4 dp (engines differ in last ulps only).
  *  - first/last are pinned as min_by/max_by over the us timestamp.
  *  - every ORDER BY carries a unique tiebreaker key.
  */
object RelationalQueries {
  private val D = DecimalType(18, 4)

  /** S1+P1+F4: scan -> projection with rename/cast/derive (the fact-build
    * projection shape, build_stock_fact_table.py:55-76).
    *
    * Money math: each factor is cast to decimal BEFORE the multiply
    * (see [[tpchQ1]]); casting the double product instead is
    * engine-divergent. The product has scale <= 4 (2dp price x 2dp
    * discount), so the final DECIMAL(18,4) cast is exact.
    *
    * The OUTPUT is cast decimal->double (exact, correctly-rounded in
    * both engines): raw decimal columns hash-diverge downstream
    * because pandas reads parquet decimal128 as Decimal objects while
    * DuckDB's result frame renders DECIMAL as float64 -- equal values,
    * different representations. Every other query already follows this
    * rule; s1 was the lone decimal-typed output. */
  def s1ScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(D).cast("double").as("qty_dec"),
      (col("l_extendedprice").cast(D) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4)))
        .cast(D).cast("double").as("revenue"),
      col("l_shipdate").cast("date").as("ship_date"))

  /** P2+P6+F9: searched CASE tiering (market_cap_tier,
    * build_stock_dimensions.py:57-59). */
  def p6CaseTier(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"), col("c_name"),
      when(col("c_acctbal") > 7500, "Large")
        .when(col("c_acctbal") > 2500, "Mid")
        .otherwise("Small").as("tier"))

  /** P3+P8+F8+F14: predicate filter pushed to the parquet scan. */
  def p3Filter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1995-07-01 00:00:00").cast(TimestampNTZType))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_shipdate").cast("date").as("ship_date"), col("l_quantity"))

  /** W1+P3+P4+P5: top-1-per-group dedup via row_number window -- the
    * reference's latest-extraction-wins dedup
    * (build_stock_fact_table.py:41-44), pinned with a unique tiebreak. */
  def w1WindowDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
  }

  /** W1 at scale: the same latest-wins dedup as [[w1WindowDedup]]
    * expressed as a max_by aggregation -- no per-partition sort, no
    * rank column, map-side combinable partials. When the rank itself
    * is not needed (it rarely is for dedup), this is the shape that
    * survives a skewed 100 TB key: the window variant sorts every
    * key partition; this one keeps one struct per key per task. */
  def w1DedupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("event_type"), col("value")),
        struct(col("ts_us"), col("event_id"))).as("e"))
      .select(col("e.event_id").as("event_id"), col("user_id"),
        col("e.ts").as("ts"), col("e.event_type").as("event_type"),
        col("e.value").as("value"))

  /** P7 pinned deterministic: dropDuplicates-by-key expressed as a
    * keyed aggregate (arbitrary-survivor -> min-key survivor). */
  def p7DedupByKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).groupBy(col("user_id"))
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_events"))

  /** J1: left equi-join factjoindim with an explicitly broadcast small
    * side (build_stock_aggregations.py:76). */
  def j1JoinLeft(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderstatus"), col("c_name"), col("c_mktsegment"))
  }

  /** J2: inner equi-join + hash aggregate over the join result. */
  def j2JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  /** J3: anti join -- the matched-row-elimination half of MERGE
    * (SURVEY S7.4 upsert core). */
  def j3AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** J3b: semi join (EXISTS surface). */
  def j3SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** A1+A4: weekly OHLCV rollup (build_stock_aggregations.py:80-97)
    * with first/last pinned as min_by/max_by over event time
    * (SURVEY S7.5.1). */
  def a1WeeklyOhlcv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val openV = min_by(col("value"), col("ts_us"))
    val closeV = max_by(col("value"), col("ts_us"))
    ev.groupBy(col("user_id"),
        year(col("ts")).as("yr"), weekofyear(col("ts")).as("wk"))
      .agg(
        openV.as("open_val"),
        closeV.as("close_val"),
        max(col("value")).as("high_val"),
        min(col("value")).as("low_val"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("total_value"),
        // null-guarded divisor (when without otherwise = NULL): a
        // zero open value exists at sf>=0.1, and ANSI mode (Spark 4
        // default) turns an unguarded /0 into a job-aborting error;
        // the oracle mirrors with nullif
        round((closeV - openV) / when(openV =!= 0.0, openV) * 100.0, 4)
          .as("return_pct"))
  }

  /** A3+A4: daily/sector-style rollup with avg/sum/count/stddev
    * (build_stock_aggregations.py:206-217). */
  def a3RollupStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("total_price"),
        round(sum(col("o_totalprice").cast(D)).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd_price"))

  /** O1: global top-k (TakeOrderedAndProject -- no full sort at scale). */
  def o1TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** S3: distributed date spine (dim_date) -- sequence+explode on
    * executors, NOT a driver-side loop like the reference
    * (build_stock_dimensions.py:112-141). */
  def s3DateSpine(s: SparkSession, dir: String): DataFrame =
    s.sql("SELECT explode(sequence(to_date('2020-01-01'), to_date('2026-12-31'))) AS date")
      .select(
        (year(col("date")) * 10000 + month(col("date")) * 100 + dayofmonth(col("date"))).as("date_key"),
        col("date"),
        year(col("date")).as("year"),
        quarter(col("date")).as("quarter"),
        month(col("date")).as("month"),
        weekofyear(col("date")).as("week"),
        date_format(col("date"), "EEEE").as("day_of_week"),
        dayofweek(col("date")).between(2, 6).as("is_weekday"))

  /** TPC-H Q1 shape -- the flagship scan->filter->agg pipeline.
    *
    * Money math happens in exact decimals: each 2-decimal factor is
    * cast to decimal FIRST, then multiplied (decimal x decimal is
    * exact in both Spark and DuckDB). Casting a multi-factor double
    * product to decimal instead is engine-divergent: Spark rounds the
    * double's shortest string repr (HALF_UP), DuckDB the exact binary
    * value.
    */
  def tpchQ1(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val ePrice = col("l_extendedprice").cast(D)
    val disc = (lit(1.0) - col("l_discount")).cast(d84)
    val tax = (lit(1.0) + col("l_tax")).cast(d84)
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
        sum(ePrice).cast("double").as("sum_base_price"),
        sum(ePrice * disc).cast("double").as("sum_disc_price"),
        sum(ePrice * disc * tax).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 (shipping-priority shape): the canonical 3-table join.
    * Segment-filtered customers broadcast into the date-filtered
    * orders FIRST (shrinks the dim side ~5x before any shuffle), the
    * fact then equi-joins on orderkey, and the revenue top-10 cuts
    * via TakeOrderedAndProject -- never a global sort.
    * o_orderpriority stands in for Q3's o_shippriority (not in the
    * driver schema); (order_date, l_orderkey) joins the tie-break so
    * the top-10 cut is a total order cross-engine. */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val cutoff = lit("1995-03-15 00:00:00").cast(TimestampNTZType)
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("order_date"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("order_date").asc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("order_date"),
        col("o_orderpriority"))
  }

  /** TPC-H Q5 (local supplier revenue by nation): the canonical
    * 6-table star join -- region filter reduces nation, nation
    * reduces supplier, all dims BROADCAST down onto the fact chain
    * (customer JOIN orders JOIN lineitem), so the only big shuffles
    * are the fact joins on their natural keys and the 5-row final
    * aggregate. Money math rides the q1/q3 DECIMAL discipline. */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val lo = lit("1994-01-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1995-01-01 00:00:00").cast(TimestampNTZType)
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  val tpchQ5Sql: String =
    """SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1994-01-01'
         AND o_orderdate < TIMESTAMP '1995-01-01'
       GROUP BY 1"""

  /** TPC-H Q6 (forecasting revenue change): pure filter + aggregate --
    * every predicate pushes to the parquet scan, the whole query is
    * one map-side-combinable partial sum. Discount band adapted to the
    * driver data's [0, 0.05] discount range. */
  def tpchQ6(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_shipdate") < lit("1995-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(D) * col("l_discount").cast(d84))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val tpchQ6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1994-01-01'
         AND l_shipdate < TIMESTAMP '1995-01-01'
         AND l_discount >= 0.02 AND l_discount <= 0.04
         AND l_quantity < 24"""

  /** Non-vacuous siblings of Q5/Q6 (r14 verdict #2): the canonical
    * 1994 windows above predate the driver data (o_orderdate spans
    * 1995..2001), so tpch_q5 hashes an EMPTY set and tpch_q6 hashes
    * `sum(NULL)` — vacuously green since round 7, the s43 failure
    * class. Per the s43 precedent the driver-green originals stay
    * untouched; these `b` twins run the IDENTICAL join/agg shape
    * with the window shifted to 1996 (a full in-range year, hundreds
    * of orders / thousands of lineitems at sf0.01), so the 6-table
    * star join's and the pushdown-agg's arithmetic is actually
    * exercised. Output rides the saga's gate-authoring rule —
    * BIGINT only: price and discount are exact at 4 decimals (that
    * is what the q1/q3 DECIMAL discipline encodes), so revenue
    * travels as an exact integer sum of 1e-8 units
    * (`price_e4 * (10000 - disc_e4)`), never DOUBLE or
    * DECIMAL(38,x). */
  private def revE8(priceCol: Column, discFactorE4: Column): Column =
    (priceCol.cast(D) * lit(10000)).cast("long") * discFactorE4

  def tpchQ5b(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val lo = lit("1996-01-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1997-01-01 00:00:00").cast(TimestampNTZType)
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        revE8(col("l_extendedprice"),
          lit(10000L) - (col("l_discount").cast(d84) * lit(10000)).cast("long"))
          .as("rev_e8"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_e8")).cast("long").as("revenue_e8"),
        count(lit(1)).cast("long").as("n_items"))
  }

  val tpchQ5bSql: String =
    """SELECT n_name,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
            * (10000 - CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT)))
         AS BIGINT) AS revenue_e8,
       count(*) AS n_items
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY 1"""

  def tpchQ6b(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(sum(revE8(col("l_extendedprice"),
          (col("l_discount").cast(d84) * lit(10000)).cast("long")))
        .cast("long").as("revenue_e8"),
        count(lit(1)).cast("long").as("n_items"))
  }

  val tpchQ6bSql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              * CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT))
         AS BIGINT) AS revenue_e8,
       count(*) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.02 AND l_discount <= 0.04
         AND l_quantity < 24"""

  val tpchQ3Sql: String =
    """SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1995-03-15'
         AND l_shipdate > TIMESTAMP '1995-03-15'
       GROUP BY 1, 3, 4
       ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
       LIMIT 10"""

  /** TPC-H Q4 shape (order-priority checking): the canonical EXISTS ->
    * LEFT-SEMI rewrite. The driver's lineitem carries no
    * commitdate/receiptdate, so "late line" becomes "returned line"
    * (l_returnflag = 'R') -- same plan shape: a date-sliced orders
    * scan semi-joined against a filtered fact. Both sides are
    * fact-sized at 100 TB, so the semi join shuffles on orderkey;
    * the 3-month orders slice keeps the build side partition-prunable
    * and AQE free to broadcast it when small. */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1996-04-01 00:00:00").cast(TimestampNTZType)
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY 1"""

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to
    * returns in one quarter, top-20 customers. Fact chain
    * lineitem ⨝ orders ⨝ customer shuffles on its natural keys;
    * nation (25 rows) broadcasts; the top-20 cuts via
    * TakeOrderedAndProject with (revenue, c_custkey) a total order. */
  def tpchQ10(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val lo = lit("1998-01-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1998-04-01 00:00:00").cast(TimestampNTZType)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
  }

  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1998-01-01'
         AND o_orderdate < TIMESTAMP '1998-04-01'
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY 1, 2, 4, 5
       ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""

  /** TPC-H Q12 shape (shipping-mode priority counts): conditional
    * aggregation over a fact-fact join. l_linestatus stands in for
    * l_shipmode (not in the driver schema). Counts use
    * count(CASE...) -- BIGINT in both engines, where sum(int) would
    * be DuckDB HUGEINT and hash-diverge. */
  def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1998-01-01 00:00:00").cast(TimestampNTZType)
    val hiPrio = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(when(hiPrio, lit(1))).as("high_line_count"),
        count(when(!hiPrio, lit(1))).as("low_line_count"))
  }

  val tpchQ12Sql: String =
    """SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY 1"""

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with the predicate on the JOIN side (filtering the orders
    * input, never the join result, so zero-order customers survive),
    * then a two-level aggregate. Both aggregates shuffle on keys that
    * shrink monotonically (custkey -> count value); no driver-side
    * loop anywhere. */
  def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val tpchQ13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey
          AND o_orderpriority <> '4-NOT SPECIFIED'
         GROUP BY c_custkey)
       GROUP BY c_count"""

  /** TPC-H Q14 shape (promotion effect): single-row percentage over a
    * month of fact joined to part. Numerator/denominator are exact
    * decimal sums cast to double; the ratio divides those two doubles
    * in the same association order in both engines, so the output is
    * bit-identical. The part join is a plain equi-join -- AQE
    * broadcasts the month-sliced fact side when it fits, and at
    * 100 TB both sides shuffle on partkey. */
  def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val lo = lit("1997-09-01 00:00:00").cast(TimestampNTZType)
    val hi = lit("1997-10-01 00:00:00").cast(TimestampNTZType)
    val zero = lit(0).cast(DecimalType(28, 8))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("rev"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev")).otherwise(zero))
          .cast("double").as("promo_revenue"),
        sum(col("rev")).cast("double").as("total_revenue"))
      .select(
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  val tpchQ14Sql: String =
    """SELECT 100.0 * promo_revenue / total_revenue AS promo_pct,
              promo_revenue, total_revenue
       FROM (SELECT
         CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1.0 - l_discount AS DECIMAL(8,4))
                  ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE) AS promo_revenue,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS total_revenue
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1997-09-01'
           AND l_shipdate < TIMESTAMP '1997-10-01')"""

  /** TPC-H Q18 shape (large-volume customers): grouped-HAVING IN
    * rewritten as join against the qualifying aggregate. The
    * sum-per-order aggregate is the only full-fact shuffle; its
    * HAVING filter (> 250 qty, ~p99) cuts it to a sliver BEFORE the
    * orders/customer joins, so AQE broadcasts the qualified side at
    * runtime. The per-order sum rides the join -- no second pass
    * over lineitem. Top-20 cuts via TakeOrderedAndProject on the
    * (o_totalprice, o_orderkey) total order. */
  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(D)).as("sum_qty_d"))
      .filter(col("sum_qty_d") > 250)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice"), col("sum_qty_d").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  val tpchQ18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
           HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY 1, 2, 3, 4, 5
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    * three OR'd brand/size/quantity bands. The union quantity band
    * [1, 30] is stated as a SEPARATE conjunct so it pushes to the
    * parquet scan (the raw disjunction references part columns and
    * cannot); the brand IN-list prunes part to dimension size, which
    * then broadcasts with the full disjunction evaluated inside the
    * join condition -- never a post-join filter over a wide
    * intermediate. */
  def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val band =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("rev"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey") && band)
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val tpchQ19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30))"""

  /** TPC-H Q22 shape (global sales opportunity): scalar subquery +
    * NOT EXISTS. c_nationkey stands in for the phone country code
    * (not in the driver schema), and -- every driver customer has
    * orders -- the anti join runs against RECENT orders only, keeping
    * the result non-degenerate. The scalar average is a 1-row
    * broadcast (never a per-row subquery); the anti join shuffles on
    * custkey against a date-pruned orders slice. avg = exact decimal
    * sum cast double / count, the cross-engine-deterministic form. */
  def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq(1, 3, 5, 7, 9, 11, 13).map(lit(_))
    val recentCut = lit("2001-01-01 00:00:00").cast(TimestampNTZType)
    val cust = Tables.customer(s, dir)
      .filter(col("c_nationkey").isin(codes: _*))
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(D)).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= recentCut).select(col("o_custkey"))
    cust
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(D)).cast("double").as("totacctbal"))
  }

  val tpchQ22Sql: String =
    """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
       FROM customer
       WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
         AND c_acctbal > (
           SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                  / count(*)
           FROM customer WHERE c_acctbal > 0.0
             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2001-01-01')
       GROUP BY 1"""

  /** TPC-H Q2 shape (min-cost supplier): the canonical correlated
    * scalar subquery, rewritten as aggregate + join-back. The driver
    * schema has no partsupp, so the part-supplier cost catalog is
    * DERIVED once as DISTINCT (l_partkey, l_suppkey, l_extendedprice)
    * -- one fact-sized shuffle that stands in for the partsupp scan.
    * Dims chain region -> nation -> supplier and BROADCAST down; the
    * per-part min is a map-side-combinable aggregate; the join-back
    * on (partkey, cost) equality replaces the per-row correlated
    * subquery with ONE partkey-shuffled join. min over raw doubles is
    * exact (no arithmetic), so the equality join-back is
    * engine-deterministic. (p_partkey, s_suppkey) is unique after the
    * min cut, making the top-100 a total order. */
  def tpchQ2(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"),
        col("l_extendedprice").as("ps_cost")).distinct()
    val europe = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(europe), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // both the min aggregate and the join-back read this frame; one
    // materialization saves re-running the fact-sized DISTINCT
    val eps = graft.ops.DedupOps.materializeOnce(
      ps.join(broadcast(supp), col("ps_suppkey") === col("s_suppkey")))
    val minCost = eps.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("ps_cost")).as("min_cost"))
    val parts = Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
      .select(col("p_partkey"))
    eps.join(minCost, col("ps_partkey") === col("mc_partkey") &&
        col("ps_cost") === col("min_cost"))
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("s_suppkey"),
        col("ps_cost").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc, col("s_suppkey").asc)
      .limit(100)
  }

  val tpchQ2Sql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey, l_extendedprice AS ps_cost FROM lineitem)
       SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
              s_suppkey, ps_cost AS supply_cost
       FROM part, ps, supplier, nation, region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_type = 'STANDARD' AND p_size <= 15
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND ps_cost = (
           SELECT min(ps2.ps_cost) FROM ps ps2, supplier s2, nation n2, region r2
           WHERE ps2.ps_partkey = ps.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
             AND s2.s_nationkey = n2.n_nationkey
             AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
       LIMIT 100"""

  /** TPC-H Q7 shape (volume shipping between two nations): the
    * OR-of-nation-pairs join. Both nation filters prune their dim
    * BEFORE any fact touch: the 2-nation supplier slice BROADCASTS
    * into the date-sliced fact (cutting it to ~2/25 of rows), and
    * only then does the orders/customer chain shuffle on its natural
    * keys -- the pair disjunction is evaluated post-join on the
    * already-pruned stream, where it is a constant-width filter, not
    * a join explosion. Year extraction casts to long so Spark's INT
    * meets DuckDB's BIGINT. */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val pair = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_9", "NATION_11"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(pair), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(pair), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1999-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_shipdate") < lit("2001-01-01 00:00:00").cast(TimestampNTZType))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("volume"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_9" &&
          col("cust_nation") === "NATION_11") ||
        (col("supp_nation") === "NATION_11" &&
          col("cust_nation") === "NATION_9"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("volume")).cast("double").as("revenue"))
  }

  val tpchQ7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(8,4)) AS volume
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey
           AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
             OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
           AND l_shipdate >= TIMESTAMP '1999-01-01'
           AND l_shipdate < TIMESTAMP '2001-01-01')
       GROUP BY 1, 2, 3"""

  /** TPC-H Q8 shape (national market share): conditional share of a
    * two-year, one-region, one-part-type volume. Part and supplier
    * slices BROADCAST onto the fact; orders carries its year through
    * the orderkey join; the region-pruned customer side joins on
    * custkey (fact-sized at 100 TB -- a shuffle, broadcastable under
    * AQE at smaller scales). The share divides two exact decimal sums
    * cast to double, the engine-deterministic form. */
  def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val zero = lit(0).cast(DecimalType(28, 8))
    val p = Tables.part(s, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val amerNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "AMERICA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("an_nationkey"))
    val amerCust = Tables.customer(s, dir)
      .join(broadcast(amerNations), col("c_nationkey") === col("an_nationkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast(TimestampNTZType) &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampNTZType))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84)).as("volume"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(amerCust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_9", col("volume"))
          .otherwise(zero)).cast("double") /
        sum(col("volume")).cast("double")).as("mkt_share"))
  }

  val tpchQ8Sql: String =
    """SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume
                ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
       FROM (SELECT year(o_orderdate) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(8,4)) AS volume,
           n2.n_name AS supp_nation
         FROM part, supplier, lineitem, orders, customer,
              nation n1, nation n2, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
           AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND p_type = 'ECONOMY')
       GROUP BY 1"""

  /** TPC-H Q9 shape (product-type profit by nation and year): the
    * LIKE-pruned part slice carries a precomputed exact unit cost
    * (p_retailprice * 0.1 stands in for ps_supplycost -- cast to
    * DECIMAL(18,4) first so every product downstream stays exact),
    * and both part and supplier-nation BROADCAST onto the fact; the
    * only fact-sized shuffle is the orderkey join that fetches the
    * order year. profit = exact decimal revenue minus exact decimal
    * cost, summed in decimal, cast double once at the end. */
  def tpchQ9(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val p = Tables.part(s, dir).filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"),
        (col("p_retailprice").cast(D) * lit(0.1).cast(d84)).cast(D)
          .as("unit_cost"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("nation"), col("o_year"),
        (col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84) -
          col("unit_cost") * col("l_quantity").cast(D)).as("amount"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("amount")).cast("double").as("sum_profit"))
  }

  val tpchQ9Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
       FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(8,4))
           - CAST(CAST(p_retailprice AS DECIMAL(18,4))
                  * CAST(0.1 AS DECIMAL(8,4)) AS DECIMAL(18,4))
             * CAST(l_quantity AS DECIMAL(18,4)) AS amount
         FROM part, supplier, lineitem, orders, nation
         WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
           AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
           AND p_name LIKE '%gear%')
       GROUP BY 1, 2"""

  /** TPC-H Q11 shape (important stock value): grouped HAVING against
    * a scalar-subquery fraction of the global total. The one-nation
    * supplier slice BROADCASTS into the fact; per-part value is a
    * map-side-combinable decimal sum; the global threshold aggregates
    * the SAME pruned stream once and joins back as a 1-row BROADCAST
    * -- never a per-group subquery. Both sides of the comparison are
    * exact decimal sums cast double, so the cut is
    * engine-deterministic. l_extendedprice stands in for
    * ps_supplycost * ps_availqty (no partsupp in the driver schema). */
  def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    val suppN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_9").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val liN = Tables.lineitem(s, dir)
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_extendedprice").cast(D).as("val_d"))
    val byPart = liN.groupBy(col("l_partkey").as("ps_partkey"))
      .agg(sum(col("val_d")).cast("double").as("part_value"))
    val total = liN.agg((sum(col("val_d")).cast("double") * lit(0.001))
      .as("threshold"))
    byPart.join(broadcast(total))
      .filter(col("part_value") > col("threshold"))
      .select(col("ps_partkey"), col("part_value"))
  }

  val tpchQ11Sql: String =
    """SELECT l_partkey AS ps_partkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
       FROM lineitem, supplier, nation
       WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         AND n_name = 'NATION_9'
       GROUP BY 1
       HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) > (
         SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                * 0.001
         FROM lineitem, supplier, nation
         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_9')"""

  /** TPC-H Q15 shape (top supplier): the revenue view + scalar max.
    * Per-supplier quarterly revenue is one map-side-combinable
    * aggregate over the date-pruned fact; the max is a 1-row
    * BROADCAST joined back (never a rank/window over the whole
    * view); supplier names BROADCAST onto the one surviving row.
    * Equality on total_revenue compares doubles derived by the
    * identical exact-decimal path on both engines. */
  def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    val d84 = DecimalType(8, 4)
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_shipdate") < lit("2000-04-01 00:00:00").cast(TimestampNTZType))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(d84))
        .cast("double").as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.join(broadcast(mx))
      .filter(col("total_revenue") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val tpchQ15Sql: String =
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01'
           AND l_shipdate < TIMESTAMP '2000-04-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, total_revenue FROM supplier, revenue
       WHERE s_suppkey = supplier_no
         AND total_revenue = (SELECT max(total_revenue) FROM revenue)"""

  /** TPC-H Q16 shape (supplier count by part attributes): DISTINCT
    * part-supplier pairs (the partsupp analogue -- one fact-sized
    * shuffle) against a NOT-IN exclusion list rewritten LEFT ANTI.
    * The attribute-filtered part slice and the (tiny) excluded
    * supplier list both BROADCAST; count(DISTINCT) shuffles once on
    * the (brand, type, size) group key. Negative account balance
    * stands in for the comment-complaints predicate. */
  def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey")).distinct()
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  val tpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey AS ps_partkey,
               l_suppkey AS ps_suppkey FROM lineitem) ps, part
       WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#5'
         AND p_type <> 'PROMO'
         AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         AND ps_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3"""

  /** TPC-H Q17 shape (small-quantity-order revenue): the per-part
    * correlated average rewritten as aggregate + join-back. The
    * brand/size part slice BROADCASTS into the fact; the per-part
    * average quantity aggregates the SAME pruned stream
    * (map-side-combinable) and joins back on partkey -- at 100 TB
    * both sides of that join shuffle on partkey, with AQE free to
    * broadcast the per-part aggregate (one row per surviving part).
    * The 0.2 * avg bar uses avg = exact decimal sum cast double over
    * count, the engine-deterministic form. */
  def tpchQ17(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_size") < 11)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val avgQ = li.groupBy(col("l_partkey").as("aq_partkey"))
      .agg((lit(0.2) * (sum(col("l_quantity").cast(D)).cast("double") /
        count(lit(1)))).as("qty_bar"))
    li.join(avgQ, col("l_partkey") === col("aq_partkey"))
      .filter(col("l_quantity") < col("qty_bar"))
      .agg((sum(col("l_extendedprice").cast(D)).cast("double") / lit(7.0))
        .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val tpchQ17Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
              / 7.0 AS avg_yearly,
       count(*) AS n_lines
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size < 11
         AND l_quantity < (
           SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4)))
                         AS DOUBLE) / count(*))
           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** TPC-H Q20 shape (potential part promotion): the nested-IN chain
    * rewritten as aggregate -> HAVING -> LEFT SEMI. The name-pruned
    * part slice BROADCASTS into the year-sliced fact; the per
    * (supplier, part) quantity sum is map-side-combinable and its
    * HAVING cut (> 40, the availqty stand-in) shrinks it to a sliver
    * BEFORE the distinct-supplier projection; the supplier table then
    * semi-joins that sliver -- at driver scale the qualified set
    * broadcasts, at 100 TB the semi join shuffles on suppkey, which
    * is as small as this query gets. */
  def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val qualified = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast(TimestampNTZType) &&
        col("l_shipdate") < lit("1999-01-01 00:00:00").cast(TimestampNTZType))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(D)).as("q"))
      .filter(col("q") > 40)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_6").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name").asc)
  }

  val tpchQ20Sql: String =
    """SELECT s_name, s_acctbal FROM supplier, nation
       WHERE s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (
               SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             AND l_shipdate >= TIMESTAMP '1998-01-01'
             AND l_shipdate < TIMESTAMP '1999-01-01'
           GROUP BY l_suppkey, l_partkey
           HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 40)
         AND s_nationkey = n_nationkey AND n_name = 'NATION_6'
       ORDER BY s_name"""

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the
    * EXISTS / NOT-EXISTS self-join pair, rewritten LEFT SEMI + LEFT
    * ANTI with the inequality (different supplier) INSIDE each join
    * condition. "Late" maps to l_returnflag = 'R' (the driver fact
    * has no receipt/commit dates). All three lineitem legs shuffle on
    * orderkey -- co-partitioned, so the semi and anti stack without
    * re-shuffling; the one-nation supplier slice BROADCASTS. The
    * top-100 cuts on (numwait desc, s_name), a total order since
    * s_name is unique. */
  def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    val l1 = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    val suppN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_9").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    l1.join(Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(l2, col("l_orderkey") === col("l2_orderkey") &&
        col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_orderkey") &&
        col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  val tpchQ21Sql: String =
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
         AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
       GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_project" -> (s1ScanProject _),
    "p6_case_tier" -> (p6CaseTier _),
    "p3_filter" -> (p3Filter _),
    "w1_window_dedup" -> (w1WindowDedup _),
    "w1_dedup_agg" -> (w1DedupAgg _),
    "p7_dedup_bykey" -> (p7DedupByKey _),
    "j1_join_left" -> (j1JoinLeft _),
    "j2_join_agg" -> (j2JoinAgg _),
    "j3_anti_join" -> (j3AntiJoin _),
    "j3_semi_join" -> (j3SemiJoin _),
    "a1_weekly_ohlcv" -> (a1WeeklyOhlcv _),
    "a3_rollup_stats" -> (a3RollupStats _),
    "o1_topk" -> (o1TopK _),
    "s3_date_spine" -> (s3DateSpine _),
    "tpch_q1" -> (tpchQ1 _),
    "tpch_q2" -> (tpchQ2 _),
    "tpch_q3" -> (tpchQ3 _),
    "tpch_q4" -> (tpchQ4 _),
    "tpch_q5" -> (tpchQ5 _),
    "tpch_q5b" -> (tpchQ5b _),
    "tpch_q6" -> (tpchQ6 _),
    "tpch_q6b" -> (tpchQ6b _),
    "tpch_q7" -> (tpchQ7 _),
    "tpch_q8" -> (tpchQ8 _),
    "tpch_q9" -> (tpchQ9 _),
    "tpch_q10" -> (tpchQ10 _),
    "tpch_q11" -> (tpchQ11 _),
    "tpch_q12" -> (tpchQ12 _),
    "tpch_q13" -> (tpchQ13 _),
    "tpch_q14" -> (tpchQ14 _),
    "tpch_q15" -> (tpchQ15 _),
    "tpch_q16" -> (tpchQ16 _),
    "tpch_q17" -> (tpchQ17 _),
    "tpch_q18" -> (tpchQ18 _),
    "tpch_q19" -> (tpchQ19 _),
    "tpch_q20" -> (tpchQ20 _),
    "tpch_q21" -> (tpchQ21 _),
    "tpch_q22" -> (tpchQ22 _),
  )

  val oracleSql: Map[String, String] = Map(
    "s1_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE) AS qty_dec,
         CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(1.0 - l_discount AS DECIMAL(8,4)) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
         CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem""",
    "p6_case_tier" ->
      """SELECT c_custkey, c_name,
         CASE WHEN c_acctbal > 7500 THEN 'Large'
              WHEN c_acctbal > 2500 THEN 'Mid'
              ELSE 'Small' END AS tier
         FROM customer""",
    "p3_filter" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(l_shipdate AS DATE) AS ship_date, l_quantity
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-07-01'""",
    // same oracle text as w1_window_dedup: both variants must produce
    // the identical survivor set
    "w1_dedup_agg" ->
      """SELECT event_id, user_id, ts, event_type, value FROM (
           SELECT event_id, user_id,
                  make_timestamp(epoch_ns(ts)//1000) AS ts,
                  event_type, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts)//1000 DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "w1_window_dedup" ->
      """SELECT event_id, user_id, ts, event_type, value FROM (
           SELECT event_id, user_id,
                  make_timestamp(epoch_ns(ts)//1000) AS ts,
                  event_type, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts)//1000 DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "p7_dedup_bykey" ->
      """SELECT user_id, min(event_id) AS first_event_id,
         count(*) AS n_events FROM events GROUP BY user_id""",
    "j1_join_left" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         o_orderstatus, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "j2_join_agg" ->
      """SELECT p_brand,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "j3_anti_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey)""",
    "j3_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 100000.0)""",
    "a1_weekly_ohlcv" ->
      """SELECT user_id,
         CAST(year(ts2) AS INT) AS yr, CAST(weekofyear(ts2) AS INT) AS wk,
         arg_min(value, ts_us) AS open_val,
         arg_max(value, ts_us) AS close_val,
         max(value) AS high_val, min(value) AS low_val,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
         round((arg_max(value, ts_us) - arg_min(value, ts_us))
               / nullif(arg_min(value, ts_us), 0) * 100.0, 4) AS return_pct
         FROM (SELECT *, epoch_ns(ts)//1000 AS ts_us,
                      make_timestamp(epoch_ns(ts)//1000) AS ts2 FROM events)
         GROUP BY 1, 2, 3""",
    "a3_rollup_stats" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo, o_orderpriority,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
         round(stddev_samp(o_totalprice), 4) AS sd_price
         FROM orders GROUP BY 1, 2, 3""",
    "o1_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "s3_date_spine" ->
      """SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS date_key,
         d AS date,
         CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
         CAST(month(d) AS INT) AS month, CAST(weekofyear(d) AS INT) AS week,
         dayname(d) AS day_of_week, (isodow(d) <= 5) AS is_weekday
         FROM (SELECT CAST(unnest(generate_series(DATE '2020-01-01',
                      DATE '2026-12-31', INTERVAL 1 DAY)) AS DATE) AS d)""",
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4)) * CAST(1.0 + l_tax AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "tpch_q2" -> tpchQ2Sql,
    "tpch_q3" -> tpchQ3Sql,
    "tpch_q4" -> tpchQ4Sql,
    "tpch_q5" -> tpchQ5Sql,
    "tpch_q5b" -> tpchQ5bSql,
    "tpch_q6" -> tpchQ6Sql,
    "tpch_q6b" -> tpchQ6bSql,
    "tpch_q7" -> tpchQ7Sql,
    "tpch_q8" -> tpchQ8Sql,
    "tpch_q9" -> tpchQ9Sql,
    "tpch_q10" -> tpchQ10Sql,
    "tpch_q11" -> tpchQ11Sql,
    "tpch_q12" -> tpchQ12Sql,
    "tpch_q13" -> tpchQ13Sql,
    "tpch_q14" -> tpchQ14Sql,
    "tpch_q15" -> tpchQ15Sql,
    "tpch_q16" -> tpchQ16Sql,
    "tpch_q17" -> tpchQ17Sql,
    "tpch_q18" -> tpchQ18Sql,
    "tpch_q19" -> tpchQ19Sql,
    "tpch_q20" -> tpchQ20Sql,
    "tpch_q21" -> tpchQ21Sql,
    "tpch_q22" -> tpchQ22Sql,
  )
}
