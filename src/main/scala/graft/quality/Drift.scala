package graft.quality

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType}

import graft.table.VersionedTableStore

/** Snapshot-to-snapshot drift report: what changed between two
  * versions of a versioned table, at the level a data-quality monitor
  * acts on -- schema evolution (added / removed / retyped columns)
  * and per-column distribution stats (row count, null rate, approx
  * NDV, min/max) side by side with their deltas.
  *
  * The monitoring companion to [[graft.table.VersionedTableStore
  * .snapshotDiff]]: the diff answers "which ROWS changed", this
  * answers "did the SHAPE of the data move" -- the check that catches
  * an upstream feed silently dropping a column, nulling a field, or
  * shifting a value distribution even when every individual row looks
  * plausible.
  *
  * Cost: one aggregate scan per side (all columns' stats in a single
  * agg -- the s15 ANALYZE shape), driver-side schema compare. At
  * 100 TB the scans are column-pruned to the monitored columns and
  * map-side combinable; nothing joins row-to-row.
  */
object Drift {

  /** One row per column in either snapshot's schema (or the monitored
    * subset): column, status (added/removed/retyped/kept), types, and
    * per-side count / nulls / approx NDV / min / max, plus each side's
    * TOTAL row count (`from_rows` / `to_rows`, repeated per row) --
    * surfaced so [[alerts]] and any downstream rate math reuse the
    * count this one aggregate pass already paid for instead of
    * re-scanning the snapshots. Non-shared or non-existent sides
    * report NULL stats. */
  def report(vs: VersionedTableStore, name: String, fromV: Long, toV: Long,
      columns: Seq[String] = Nil): DataFrame = {
    val spark = vs.spark
    val from = vs.readVersion(name, fromV)
    val to = vs.readVersion(name, toV)
    val pick = (sch: StructType) =>
      if (columns.isEmpty) sch.fields.toSeq
      else sch.fields.toSeq.filter(f => columns.contains(f.name))
    val fromFields = pick(from.schema).map(f => f.name -> f).toMap
    val toFields = pick(to.schema).map(f => f.name -> f).toMap
    val all = (pick(from.schema).map(_.name) ++
      pick(to.schema).map(_.name)).distinct

    def sideStats(df: DataFrame, fields: Map[String, _]): Map[String, Row] = {
      val present = all.filter(fields.contains)
      if (present.isEmpty) return Map.empty
      val aggs = present.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          approx_count_distinct(col(c)).as(s"${c}__ndv"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }
      val r = df.agg(count(lit(1)).as("__rows"), aggs: _*).head()
      present.map(c => c -> r).toMap + ("__rows" -> r)
    }
    val fs = sideStats(from, fromFields)
    val ts = sideStats(to, toFields)

    val rows = all.map { c =>
      val ff = fromFields.get(c)
      val tf = toFields.get(c)
      val status = (ff, tf) match {
        case (Some(a), Some(b)) if a.dataType == b.dataType => "kept"
        case (Some(_), Some(_)) => "retyped"
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case _ => "kept"
      }
      def stat(side: Map[String, Row], suffix: String): Option[Any] =
        side.get(c).flatMap(r => Option(r.getAs[Any](s"${c}__$suffix")))
      def longStat(side: Map[String, Row], suffix: String): Option[Long] =
        stat(side, suffix).map(_.asInstanceOf[Number].longValue())
      def strStat(side: Map[String, Row], suffix: String): Option[String] =
        stat(side, suffix).map(_.toString)
      def totalRows(side: Map[String, Row]): Option[Long] =
        side.get("__rows").flatMap(r => Option(r.getAs[Any]("__rows")))
          .map(_.asInstanceOf[Number].longValue())
      Row(c, status,
        ff.map(_.dataType.simpleString).orNull,
        tf.map(_.dataType.simpleString).orNull,
        totalRows(fs).map(Long.box).orNull,
        totalRows(ts).map(Long.box).orNull,
        longStat(fs, "n").map(Long.box).orNull,
        longStat(ts, "n").map(Long.box).orNull,
        longStat(fs, "nulls").map(Long.box).orNull,
        longStat(ts, "nulls").map(Long.box).orNull,
        longStat(fs, "ndv").map(Long.box).orNull,
        longStat(ts, "ndv").map(Long.box).orNull,
        strStat(fs, "min").orNull, strStat(ts, "min").orNull,
        strStat(fs, "max").orNull, strStat(ts, "max").orNull)
    }
    val schema = StructType.fromDDL(
      "column STRING, status STRING, from_type STRING, to_type STRING," +
        " from_rows BIGINT, to_rows BIGINT," +
        " from_n BIGINT, to_n BIGINT, from_nulls BIGINT, to_nulls BIGINT," +
        " from_ndv BIGINT, to_ndv BIGINT, from_min STRING, to_min STRING," +
        " from_max STRING, to_max STRING")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }

  /** The alert cut over [[report]]: columns whose shape moved --
    * schema status != kept, null-RATE shift beyond `nullRatePct`
    * percentage points, or min/max range drift on numeric columns
    * beyond `rangePct` percent of the old range. Empty = calm.
    * Null-rate denominators ride report()'s own `from_rows`/`to_rows`
    * columns -- the snapshots are scanned exactly once per side (the
    * report aggregate), never re-counted here. */
  def alerts(vs: VersionedTableStore, name: String, fromV: Long, toV: Long,
      columns: Seq[String] = Nil, nullRatePct: Double = 5.0,
      rangePct: Double = 20.0): DataFrame = {
    val numericCols = vs.readVersion(name, toV).schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val r = report(vs, name, fromV, toV, columns)
    val fromRows = greatest(col("from_rows").cast("double"), lit(1.0))
    val toRows = greatest(col("to_rows").cast("double"), lit(1.0))
    val nullShift =
      abs(col("to_nulls") / toRows - col("from_nulls") / fromRows) * 100.0
    val isNumeric = col("column").isin(numericCols.toSeq: _*)
    val oldRange =
      abs(col("from_max").cast("double") - col("from_min").cast("double"))
    val rangeDrift = (abs(col("to_max").cast("double") - col("from_max").cast("double")) +
      abs(col("to_min").cast("double") - col("from_min").cast("double"))) /
      greatest(oldRange, lit(1e-12)) * 100.0
    r.withColumn("null_shift_pct", round(nullShift, 4))
      .withColumn("range_drift_pct",
        when(isNumeric, round(rangeDrift, 4)).otherwise(lit(null)))
      .filter(col("status") =!= "kept" ||
        col("null_shift_pct") > nullRatePct ||
        coalesce(col("range_drift_pct"), lit(0.0)) > rangePct)
  }
}
