package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, not}

import graft.table.WarehouseWrites

/** Tag for one persisted validation run: a stable id (idempotence key
  * -- re-running a run replaces its own rows, never appends dups) and
  * the run's wall-clock stamp, injected so pipelines with a frozen
  * clock stay deterministic. */
case class ValidationRun(runId: String, validatedAt: String)

/** Persistent validation history -- the engine's analogue of Great
  * Expectations checkpoint run results, which the reference stores as
  * queryable run history + data docs per checkpoint
  * (docker/great_expectations/checkpoints/weekly_agg_validation.yml,
  * create_expectations.py). [[Validator]] evaluates a suite in-memory;
  * this class lands every [[RuleResult]] (passes AND failures) in a
  * warehouse table so an operator can ask "when did rule X last fail
  * and by how much" long after the run.
  *
  * Layout: one row per (run, suite, rule), hive-partitioned by
  * `run_id`. A record is a partition-local dynamic overwrite, so
  * retries of the same run are idempotent and never touch other runs'
  * history; at scale a run appends one small partition, not a table
  * rewrite. Results are tiny (rules x suites rows per run), so the
  * single-task write is the right plan.
  */
class ValidationLog(store: WarehouseWrites, val table: String = "validation_results") {

  /** Persist one run's results across its suites. */
  def record(run: ValidationRun, processingDate: String,
      suites: Seq[(String, Seq[RuleResult])]): Unit = {
    val spark = store.spark
    import spark.implicits._
    val rows = suites.flatMap { case (suite, rs) =>
      rs.map(r => (processingDate, run.validatedAt, suite,
        r.rule, r.detail, r.passed, r.violations, r.totalRows, run.runId))
    }
    val df = rows.toDF("processing_date", "validated_at", "suite",
      "rule", "detail", "passed", "violations", "total_rows", "run_id")
    store.overwritePartitions(df, table, Seq("run_id"))
  }

  def exists: Boolean = store.exists(table)

  /** Full run history, queryable like any warehouse table. */
  def history: DataFrame = store.read(table)

  /** Only the failing rule rows -- the operator's alert feed. */
  def failures: DataFrame = history.filter(not(col("passed")))
}
