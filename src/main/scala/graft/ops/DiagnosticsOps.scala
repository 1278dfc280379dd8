package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.KmvSketch.kmv
import graft.functions.TopKFreq.topkFreq
import graft.ops.Hashing._

/** Operational skew diagnostics -- the "do I need to salt this key?"
  * tooling that pairs with the engine's salted joins. Everything here
  * is one bounded-state pass over the data; nothing collects more
  * than the report itself to the driver.
  */
object DiagnosticsOps {

  /** The k heaviest values of a prospective join/agg key, each with
    * its frequency and share of total rows. One map-side-combinable
    * SpaceSaving pass over the hashed key (bounded sketch state,
    * exact while distinct keys <= capacity, frequency upper bounds
    * beyond that), then one broadcast-filtered pass recovers the
    * readable key values for just the top k hashes.
    *
    * A top share near 1/partitions is harmless; a single key holding
    * tens of percent is the signal to salt (see the LSH joins' salt
    * discipline) or pre-aggregate. */
  def keySkew(df: DataFrame, key: Column, k: Int = 20,
      capacity: Int = 4096): DataFrame = {
    // deliberately NOT materialized: the projection is 2 narrow
    // columns, and two pushed-down scans beat checkpointing the whole
    // keyed stream at any real size
    val keyed = df.select(key.cast("string").as("key_value"))
      .withColumn("kh", h15(col("key_value")))
    val sk = keyed.agg(topkFreq(col("kh"), k, capacity).as("top"),
      count(lit(1)).as("n_rows"))
    val top = sk
      .select(posexplode(col("top")).as(Seq("idx", "entry")), col("n_rows"))
      .select((col("idx") + 1).cast("int").as("rank"),
        col("entry.item").as("kh"), col("entry.cnt").as("freq"),
        col("n_rows"))
    val names = keyed
      .join(broadcast(top.select(col("kh"))), Seq("kh"), "left_semi")
      .distinct()
    top.join(broadcast(names), Seq("kh"))
      .select(col("rank"), col("key_value"), col("freq"),
        round(col("freq").cast("double") / col("n_rows"), 4).as("share"))
  }

  /** Physical partition balance of a DataFrame as it would execute:
    * rows per partition plus the max/mean imbalance ratio -- the
    * straggler early-warning. One narrow pass; partition ids are an
    * execution property, so this is a diagnostic, not an oracle-able
    * query. */
  def partitionBalance(df: DataFrame): DataFrame = {
    val per = df.select(spark_partition_id().as("partition_id"))
      .groupBy(col("partition_id")).agg(count(lit(1)).as("n_rows"))
    per.crossJoin(broadcast(
        per.agg(max(col("n_rows")).as("mx"),
          avg(col("n_rows")).as("mean"))))
      .select(col("partition_id"), col("n_rows"),
        round(col("mx") / col("mean"), 2).as("max_over_mean"))
  }

  /** Distinct-key overlap between every pair of sides (partitions /
    * snapshots / sources) via per-side KMV sketches: one
    * map-side-combinable pass builds a bounded k-min synopsis per
    * side, then all pair arithmetic runs on the side-count-sized
    * sketch table -- the raw key sets are never shuffled, which is
    * the only way a "how much do these 100 TB sources overlap"
    * diagnostic is answerable. Below capacity (`saturated = false`
    * on both sides) every number is EXACT -- the oracle regime;
    * above it the standard KMV estimators take over: D ~ (k-1)/u(k)
    * per side and |A ^ B| ~ J(K) * D(A u B) over the combined k-min
    * set (Beyer et al., SIGMOD'07).
    *
    * Output: (side_a, side_b, n_a, n_b, n_common) for side_a <
    * side_b. */
  def keyOverlap(df: DataFrame, side: Column, key: Column,
      k: Int = 32768): DataFrame = {
    val sk = df.select(side.as("side"), xxhash64(key).as("kh"))
      .groupBy(col("side")).agg(kmv(col("kh"), k).as("sk"))
    // flipped-long -> uniform [0,1): (v + 2^63) / 2^64 in doubles --
    // approximate-path only, so the double rounding is immaterial
    def u(c: String) =
      s"(CAST($c AS DOUBLE) + 9.223372036854776E18) / 1.8446744073709552E19"
    def nd(p: String) =
      s"""CASE WHEN NOT $p.sk.saturated
            THEN CAST(size($p.sk.mins) AS BIGINT)
            ELSE CAST(round((${k - 1})
              / greatest(${u(s"element_at($p.sk.mins, $k)")}, 1e-18))
              AS BIGINT) END"""
    sk.as("a").join(sk.as("b"), expr("a.side < b.side"))
      .selectExpr("a.side AS side_a", "b.side AS side_b",
        s"${nd("a")} AS n_a", s"${nd("b")} AS n_b",
        "array_intersect(a.sk.mins, b.sk.mins) AS inter0",
        "array_sort(array_union(a.sk.mins, b.sk.mins)) AS us",
        "a.sk.saturated OR b.sk.saturated AS sat")
      .selectExpr("side_a", "side_b", "n_a", "n_b", "inter0", "us", "sat",
        s"least(size(us), $k) AS keff")
      .selectExpr("side_a", "side_b", "n_a", "n_b",
        s"""CASE WHEN NOT sat THEN CAST(size(inter0) AS BIGINT)
            ELSE CAST(round(
              (CAST(size(array_intersect(slice(us, 1, keff), inter0))
                    AS DOUBLE) / keff)
              * (keff - 1)
              / greatest(${u("element_at(us, keff)")}, 1e-18))
              AS BIGINT) END AS n_common""")
  }

  /** Oracle-gated binding: distinct-customer overlap between order
    * years 1995-1997 (three side pairs; per-year NDV is far below the
    * 32k capacity at the gate's scale, so the sketch runs exact and
    * hash-matches the DuckDB DISTINCT/INTERSECT twin). */
  def aggKmvOverlap(s: SparkSession, dir: String): DataFrame =
    keyOverlap(
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).between(1995, 1997)),
      year(col("o_orderdate")).cast("int"), col("o_custkey"))
      .withColumnRenamed("side_a", "year_a")
      .withColumnRenamed("side_b", "year_b")

  val aggKmvOverlapSql: String =
    """WITH y AS (SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS yr,
                o_custkey AS ck
         FROM orders
         WHERE year(o_orderdate) BETWEEN 1995 AND 1997),
       n AS (SELECT yr, count(*) AS nd FROM y GROUP BY yr),
       c AS (SELECT a.yr AS ya, b.yr AS yb, count(*) AS nc
             FROM y a JOIN y b ON a.ck = b.ck AND a.yr < b.yr
             GROUP BY 1, 2)
       SELECT na.yr AS year_a, nb.yr AS year_b,
              CAST(na.nd AS BIGINT) AS n_a, CAST(nb.nd AS BIGINT) AS n_b,
              CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_common
       FROM n na JOIN n nb ON na.yr < nb.yr
       LEFT JOIN c ON c.ya = na.yr AND c.yb = nb.yr"""

  /** Two-sample Kolmogorov-Smirnov drift statistic between the rows
    * where `side1` holds and the rest, over numeric `value` -- THE
    * distribution-shift alarm for a training-data pipeline (did this
    * source's quality-score / length / price distribution move
    * between snapshots?). Where [[graft.quality.Drift.report]]
    * compares summary stats, this compares whole ECDFs.
    *
    * Exact integers end-to-end: with per-value counts c1/c2 and
    * inclusive prefix sums cum1/cum2 at each distinct observed value,
    *   D = max_v |cum1(v)/n1 - cum2(v)/n2|
    *     = max_v |n2*cum1(v) - n1*cum2(v)| / (n1*n2)
    * so the gate emits the integer numerator `d_num` (plus n1, n2,
    * and the distinct-value count) -- no float division anywhere.
    * ECDFs are step functions changing only at observed values, so
    * evaluating at the distinct values IS the supremum. Exact while
    * n1*n2 < 2^63 (~3e9 rows per side); past that the caller divides
    * in doubles, which moves a drift ALARM by nothing.
    *
    * Scale shape: one map-side-combinable per-value count aggregate
    * (distinct-value-sized output), then the two prefix sums run
    * through [[BoundedWindows.prefixSum]] -- equal-width value bins,
    * running offsets over the <=bins-row aggregate only -- so no
    * task ever sorts the full distinct-value stream; the final max
    * is again map-side combinable. Nothing row-sized ever shuffles
    * twice. */
  def ksDrift(df: DataFrame, side1: Column, value: Column): DataFrame = {
    val g = df.select(side1.as("is1"), value.as("v"))
      .groupBy(col("v")).agg(
        sum(when(col("is1"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("is1"), 0L).otherwise(1L)).as("c2"))
      .withColumn("g", lit(1))
    val cum1 = BoundedWindows.prefixSum(g, Seq("g"), "v", Nil, col("c1"), "cum1")
    val cum = BoundedWindows.prefixSum(cum1, Seq("g"), "v", Nil, col("c2"), "cum2")
    val tot = g.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("n2") * col("cum1") - col("n1") * col("cum2")).as("dn"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("dn")).cast("long").as("d_num"),
        count(lit(1)).cast("long").as("n_values"))
  }

  /** Oracle-gated binding: order-price distribution drift between
    * order years 1996 and 1997. `o_totalprice` doubles group and
    * order bit-identically cross-engine (no arithmetic ever touches
    * them); every emitted column is an exact BIGINT. */
  def diagKsDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
    ksDrift(o, year(col("o_orderdate")) === 1996, col("o_totalprice"))
  }

  val diagKsDriftSql: String =
    """WITH s AS (
         SELECT o_totalprice AS v,
                CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS is1
         FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
       g AS (SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
                    CAST(SUM(1 - is1) AS BIGINT) AS c2
             FROM s GROUP BY v),
       c AS (SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
                    SUM(c2) OVER (ORDER BY v) AS cum2
             FROM g),
       t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                    CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
       SELECT n1, n2,
              CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_num,
              CAST(COUNT(*) AS BIGINT) AS n_values
       FROM c, t GROUP BY n1, n2"""

  /** Oracle-gated binding: heaviest user_ids in the events stream
    * (distinct users << capacity, so the sketch is exact and
    * hash-matches the DuckDB group-by twin). */
  def diagKeySkew(s: SparkSession, dir: String): DataFrame =
    keySkew(Tables.events(s, dir), col("user_id"), k = 10)

  val diagKeySkewSql: String =
    s"""WITH f AS (
         SELECT CAST(user_id AS VARCHAR) AS key_value, count(*) AS freq,
                ${h15Sql("CAST(user_id AS VARCHAR)")} AS kh
         FROM events GROUP BY 1),
       t AS (SELECT CAST(sum(freq) AS DOUBLE) AS n_rows FROM f),
       r AS (SELECT key_value, freq, kh,
               CAST(row_number() OVER (ORDER BY freq DESC, kh ASC) AS INT)
                 AS rank
             FROM f)
       SELECT rank, key_value, CAST(freq AS BIGINT) AS freq,
              round(freq / n_rows, 4) AS share
       FROM r, t WHERE rank <= 10"""
}
