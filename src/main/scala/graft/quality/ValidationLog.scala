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

  /** The most recently validated run id (by stamp, then id for
    * determinism under equal frozen-clock stamps). */
  def latestRunId: String = {
    import org.apache.spark.sql.functions.{max, struct}
    history.agg(max(struct(col("validated_at"), col("run_id"))))
      .head().getStruct(0).getString(1)
  }

  /** GX "data docs" analogue: one run's persisted results rendered as
    * a human-readable markdown report (the reference uploads rendered
    * docs per checkpoint run; the engine renders from the queryable
    * history, so docs and history can never disagree). Driver-side
    * string work over a rules-x-suites result set -- a report is tiny
    * by construction. */
  def renderDataDocs(runId: String): String = {
    val rows = history.filter(col("run_id") === runId)
      .select("suite", "rule", "detail", "passed", "violations",
        "total_rows", "processing_date", "validated_at")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getString(7)))
      .sortBy(t => (t._1, t._2, t._3))
    require(rows.nonEmpty, s"no recorded validation run '$runId'")
    val (date, at) = (rows.head._7, rows.head._8)
    val sb = new StringBuilder
    val nPass = rows.count(_._4)
    val verdict = if (nPass == rows.length) "PASSED" else "FAILED"
    sb ++= s"# Validation run `$runId` - $verdict\n\n"
    sb ++= s"- processing_date: $date\n- validated_at: $at\n"
    sb ++= s"- rules passed: $nPass/${rows.length}\n"
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (suite, rs) =>
      val p = rs.count(_._4)
      sb ++= s"\n## Suite `$suite` - $p/${rs.length} passed\n\n"
      sb ++= "| rule | detail | status | violations | rows |\n"
      sb ++= "|---|---|---|---|---|\n"
      rs.foreach { case (_, rule, detail, passed, viol, total, _, _) =>
        val status = if (passed) "pass" else "**FAIL**"
        sb ++= s"| $rule | $detail | $status | $viol | $total |\n"
      }
    }
    sb.toString
  }

  /** [[renderDataDocs]] for the latest recorded run. */
  def renderLatestDataDocs(): String = renderDataDocs(latestRunId)
}
