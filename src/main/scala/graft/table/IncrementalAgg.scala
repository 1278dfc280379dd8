package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of `SELECT keys, count(*), sum(v)...
  * GROUP BY keys` aggregates from a snapshot changelog -- the
  * materialized-view-maintenance story: a daily delta updates the
  * rollup in O(changed rows + touched groups) instead of a full
  * base-table rescan.
  *
  * Input is [[VersionedTableStore.snapshotDiff]] with
  * `includePre = true`. The delta is exact for count/sum-family
  * aggregates (avg = sum/count downstream); min/max are NOT
  * incrementally maintainable under deletes and are out of scope.
  *
  * Scale shape: the changelog reduces to one row per TOUCHED group
  * (map-side combinable), then joins the aggregate on its group key
  * -- both sides hash-partitioned on the key, the aggregate table
  * never rescans its base.
  */
object IncrementalAgg {

  /** Collapse a pre-image changelog to one delta row per touched
    * group: post-side rows (inserts + updates) contribute (+1, +v) to
    * the POST group; pre-side rows (updates + deletes) contribute
    * (-1, -pre_v) to the PRE group. An update that moves groups thus
    * transfers its contribution; one that stays nets only its value
    * change. Output: groupKeys, __dn, __dv_<c> per sum column. */
  def sumCountDelta(diff: DataFrame, groupKeys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val post = diff.filter(col("change_type") =!= "delete").select(
      groupKeys.map(col) ++ Seq(lit(1L).as("__dn")) ++
        sums.map(c => col(c).as(s"__dv_$c")): _*)
    val pre = diff.filter(col("change_type") =!= "insert").select(
      groupKeys.map(k => col(s"pre_$k").as(k)) ++ Seq(lit(-1L).as("__dn")) ++
        sums.map(c => (-col(s"pre_$c")).as(s"__dv_$c")): _*)
    post.unionByName(pre)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__dn")).as("__dn"),
        sums.map(c => sum(col(s"__dv_$c")).as(s"__dv_$c")): _*)
  }

  /** Apply a [[sumCountDelta]] to the aggregate table (columns:
    * groupKeys, `countCol`, the sum columns, same names as the base).
    * Groups whose maintained count reaches zero drop out -- exactly
    * the rows a recompute would not produce. A sum stays NULL when
    * both sides are NULL (SQL sum over an all-NULL group is NULL, not
    * 0 -- coalescing both sides to 0 would diverge from a recompute);
    * one NULL side coalesces to 0 so the other side's value carries,
    * which matches sum's NULL-skipping. */
  def applyTo(agg: DataFrame, delta: DataFrame, groupKeys: Seq[String],
      sums: Seq[String], countCol: String): DataFrame =
    agg.join(delta, groupKeys, "full_outer")
      .select(groupKeys.map(col) ++
        Seq((coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol)) ++
        sums.map(c => when(col(c).isNull && col(s"__dv_$c").isNull,
            lit(null))
          .otherwise(coalesce(col(c), lit(0L)) +
            coalesce(col(s"__dv_$c"), lit(0L))).as(c)): _*)
      .filter(col(countCol) > 0)
}
