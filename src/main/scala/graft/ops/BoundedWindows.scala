package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof running sums: the bucket-offset decomposition of
  * `sum(v) OVER (PARTITION BY part ORDER BY ord)` for partition keys
  * whose cardinality does NOT grow with the data (pack streams,
  * train/val/test splits, event types). A plain window there puts an
  * entire stream into one task's sort -- the `low-card-window` shape
  * [[graft.plans.PlanAudit.auditWindowCardinality]] flags -- while
  * this computes the IDENTICAL prefix sum with no window partition
  * wider than ~1/bins of a stream:
  *
  *  1. one broadcast per-key (min, max) aggregate assigns every row an
  *     equal-width BUCKET of its leading order column -- bucket order
  *     is therefore prefix order;
  *  2. the running sum runs per (key, bucket) -- bounded state;
  *  3. a per-(key, bucket) total agg (<= keys x bins rows), cumulated
  *     by a window over that TINY aggregate only and broadcast back,
  *     lifts local sums to exact global ones.
  *
  * Exactness: integer/decimal sums are order-insensitive, so
  * regrouping changes nothing; bucket boundaries only partition the
  * work. Same idiom as p17_shuffle_shard's rank offsets and
  * w9_rank_agg -- this is the prefix-SUM member of that family.
  */
object BoundedWindows {

  /** Default bucket count: 256 keeps the offset table tiny (keys x
    * 256) while bounding any window partition at ~0.4% of its stream
    * under a uniform leading key. */
  val DefaultBins = 256

  /** Appends `outCol` = running sum of `value` over
    * (PARTITION BY parts ORDER BY ord, ties) -- INCLUSIVE of the
    * current row -- computed in the bounded two-stage shape above.
    *
    * `ord` must be numeric and non-null (it is range-bucketed);
    * `ties` complete the total order within a bucket. Internal
    * columns `__bw_*` are dropped from the result. */
  def prefixSum(df: DataFrame, parts: Seq[String], ord: String,
      ties: Seq[String], value: Column, outCol: String,
      bins: Int = DefaultBins): DataFrame = {
    val pcols = parts.map(col)
    val bounds = df.groupBy(pcols: _*)
      .agg(min(col(ord)).as("__bw_lo"), max(col(ord)).as("__bw_hi"))
    // bucket arithmetic in DOUBLE: 60-bit hash ordinals times `bins`
    // overflow a long (ANSI aborts); double rounding is weakly
    // MONOTONE in ord, which is all bucketing needs -- bin edges only
    // partition the work, results stay exact whatever the edges
    val od = col(ord).cast("double")
    val lod = col("__bw_lo").cast("double")
    val hid = col("__bw_hi").cast("double")
    val binned = df.join(broadcast(bounds), parts)
      .withColumn("__bw_bin",
        when(col("__bw_hi") === col("__bw_lo"), lit(0)).otherwise(
          least(lit(bins - 1),
            floor((od - lod) * bins / (hid - lod)).cast("int"))))
      .withColumn("__bw_v", value)
    val perBin = binned.groupBy((pcols :+ col("__bw_bin")): _*)
      .agg(sum(col("__bw_v")).as("__bw_sum"))
    val wOff = Window.partitionBy(pcols: _*).orderBy(col("__bw_bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBin.withColumn("__bw_off",
      coalesce(sum(col("__bw_sum")).over(wOff), lit(0L))).drop("__bw_sum")
    val wLocal = Window.partitionBy((pcols :+ col("__bw_bin")): _*)
      .orderBy((col(ord).asc +: ties.map(col(_).asc)): _*)
    binned
      .withColumn("__bw_local", sum(col("__bw_v")).over(wLocal))
      .join(broadcast(offsets), parts :+ "__bw_bin")
      .withColumn(outCol, col("__bw_off") + col("__bw_local"))
      .drop("__bw_bin", "__bw_v", "__bw_local", "__bw_off",
        "__bw_lo", "__bw_hi")
  }
}
