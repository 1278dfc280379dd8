package graft.quality

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.TableStore

class ValidationLogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new ValidationLog(
    new TableStore(spark, Files.createTempDirectory("graft-vlog").toString))

  private val pass = RuleResult("not_null", "k", passed = true, 0, 100)
  private val fail = RuleResult("unique", "k", passed = false, 3, 100)

  test("history accumulates across runs; failures filter to the alert feed") {
    val log = fresh()
    assert(!log.exists)
    log.record(ValidationRun("daily-2026-02-09", "t1"), "2026-02-09",
      Seq("fact" -> Seq(pass, fail), "dim" -> Seq(pass)))
    log.record(ValidationRun("daily-2026-02-10", "t2"), "2026-02-10",
      Seq("fact" -> Seq(pass, pass)))
    assert(log.exists)
    assert(log.history.count() === 5)
    // failures persist too (a post-mortem can see what failed and by
    // how much, like a GX checkpoint run that failed its DAG task)
    val f = log.failures.select("run_id", "suite", "rule", "violations")
      .as[(String, String, String, Long)].collect().toSeq
    assert(f === Seq(("daily-2026-02-09", "fact", "unique", 3L)))
    // history is queryable per run across runs
    assert(log.history.filter($"run_id" === "daily-2026-02-10").count() === 2)
  }

  test("data docs render the persisted run: verdict, per-suite counts, FAIL rows") {
    val log = fresh()
    log.record(ValidationRun("daily-2026-02-09", "t1"), "2026-02-09",
      Seq("fact" -> Seq(pass, fail), "dim" -> Seq(pass)))
    log.record(ValidationRun("daily-2026-02-10", "t2"), "2026-02-10",
      Seq("fact" -> Seq(pass, pass)))
    val docs = log.renderDataDocs("daily-2026-02-09")
    assert(docs.contains("`daily-2026-02-09` - FAILED"))
    assert(docs.contains("rules passed: 2/3"))
    assert(docs.contains("## Suite `fact` - 1/2 passed"))
    assert(docs.contains("## Suite `dim` - 1/1 passed"))
    assert(docs.contains("| unique | k | **FAIL** | 3 | 100 |"))
    assert(docs.contains("| not_null | k | pass | 0 | 100 |"))
    // latest = highest stamp; an all-green run renders PASSED
    assert(log.latestRunId === "daily-2026-02-10")
    assert(log.renderLatestDataDocs().contains("`daily-2026-02-10` - PASSED"))
    // unknown runs fail loudly, not with an empty report
    intercept[IllegalArgumentException] { log.renderDataDocs("nope") }
  }

  test("re-recording a run id replaces its rows, never duplicates (retry-idempotent)") {
    val log = fresh()
    log.record(ValidationRun("daily-d", "t1"), "d", Seq("fact" -> Seq(pass, fail)))
    log.record(ValidationRun("daily-d", "t2"), "d", Seq("fact" -> Seq(pass)))
    assert(log.history.count() === 1)
    assert(log.history.select("validated_at").as[String].head() === "t2")
    // and other runs' partitions were untouched by the overwrite
    log.record(ValidationRun("daily-e", "t3"), "e", Seq("fact" -> Seq(pass)))
    log.record(ValidationRun("daily-d", "t4"), "d", Seq("fact" -> Seq(pass)))
    assert(log.history.filter($"run_id" === "daily-e").count() === 1)
  }
}
