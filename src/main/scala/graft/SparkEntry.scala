package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.RelationalQueries

/** Driver contract -- see /root/repo/SURVEY.md S7 + the builder prompt.
  *
  * `queries` maps SURVEY S2 operator ids to DataFrame builders over the
  * driver's synthetic tables; `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's hash-match correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.tpchQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md S2, plus the
    * training-data ops (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ graft.queries.LibraryQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.ops.OpsQueries.queries ++ graft.queries.ForensicGates.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ graft.queries.LibraryQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.ops.OpsQueries.oracleSql ++ graft.queries.ForensicGates.oracleSql

  /** Bench-only substitutions. The approx-sketch oracle entries are
    * tolerance-band GATES that also compute the exact twin (multi-col
    * exact distinct = Expand + full shuffle; exact percentile = full
    * per-group sorted collection) purely to band the sketch -- correct
    * for the correctness gate, wrong as a perf measurement. The bench
    * measures the PRODUCTION sketch operators under the same names so
    * BENCH numbers describe what a user would actually run at 100 TB;
    * Verify/the oracle keep consulting [[queries]] alone. */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.AnalyticsQueries.benchOverrides ++
      graft.queries.LibraryQueries.benchOverrides ++
      graft.ops.OpsQueries.benchOverrides
}
