package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)

  test("audit flags each seeded scale-killer exactly once") {
    // cartesian: force both sides unbroadcastable
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cart = PlanAudit.audit(docs.crossJoin(
        docs.select(col("doc_id").as("other"))))
      assert(cart.map(_.rule) === Seq("cartesian-product"), cart.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    // global sort (no limit -> SortExec global, not TakeOrdered)
    val srt = PlanAudit.audit(docs.orderBy(col("n_chars").desc))
    assert(srt.map(_.rule) === Seq("global-sort"), srt.toString)
    // corpus-wide window: row_number over an unpartitioned ordering
    val win = PlanAudit.audit(docs.withColumn("r",
      row_number().over(Window.orderBy(col("doc_id")))))
    assert(win.map(_.rule) === Seq("global-window"), win.toString)
    intercept[IllegalStateException] {
      PlanAudit.assertScales(docs.orderBy(col("n_chars")))
    }
  }

  test("the allowed idioms stay clean") {
    // top-k compiles to TakeOrderedAndProject: no global SortExec
    assert(PlanAudit.audit(docs.orderBy(col("n_chars").desc).limit(5)).isEmpty)
    // global window OVER AN AGGREGATE is the broadcast-offsets idiom
    val offsets = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("off", sum(col("n")).over(
        Window.orderBy(col("lang")).rowsBetween(Window.unboundedPreceding, -1)))
    assert(PlanAudit.audit(offsets).isEmpty)
    // partitioned windows and broadcast joins are clean
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    assert(PlanAudit.audit(docs.withColumn("r", row_number().over(w))).isEmpty)
    // allowlist suppresses an accepted rule
    PlanAudit.assertScales(docs.orderBy(col("n_chars")),
      allow = Set("global-sort"))
  }

  test("every shipped query passes the audit (modulo declared presentation sorts)") {
    // TPC-H query text MANDATES a final ORDER BY (presentation order);
    // without a LIMIT that is a global sort of the (small, aggregated)
    // result -- accepted for those queries only, and only for that rule
    val presentationSort = Set(
      "tpch_q1", "tpch_q4", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9",
      "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q16",
      "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q22")
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val allow = if (presentationSort(name)) Set("global-sort")
          else Set.empty[String]
        val findings = PlanAudit.audit(fn(spark, dir))
          .filterNot(f => allow.contains(f.rule))
        if (findings.isEmpty) Nil else Seq(name -> findings)
    }
    assert(failures.isEmpty,
      failures.map { case (n, fs) => s"$n -> ${fs.mkString("; ")}" }
        .mkString("\n"))
  }
}
