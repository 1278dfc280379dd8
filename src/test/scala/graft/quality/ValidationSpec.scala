package graft.quality

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ValidationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Option("AAPL"), 10.0, 5.0),
    (2L, Option("MSFT"), 20.0, 25.0), // high < low -> PairGreater violation
    (3L, Option.empty[String], 30.0, 10.0), // null symbol
    (4L, Option("AAPL"), 40.0, 20.0)
  ).toDF("id", "symbol", "high", "low")

  private def result(rules: Seq[Rule]) = Validator.run(df, rules)

  test("columns_match_ordered_list") {
    assert(result(Seq(ColumnsMatchOrderedList(Seq("id", "symbol", "high", "low")))).head.passed)
    assert(!result(Seq(ColumnsMatchOrderedList(Seq("id", "high", "symbol", "low")))).head.passed)
  }

  test("column_exists") {
    assert(result(Seq(ColumnExists("high"))).head.passed)
    assert(!result(Seq(ColumnExists("nope"))).head.passed)
  }

  test("not_null counts null rows") {
    val r = result(Seq(NotNull("symbol"))).head
    assert(!r.passed && r.violations === 1 && r.totalRows === 4)
  }

  test("unique on key column") {
    assert(result(Seq(Unique(Seq("id")))).head.passed)
    val dup = result(Seq(Unique(Seq("symbol")))).head
    assert(!dup.passed && dup.violations === 1) // AAPL twice; null excluded
  }

  test("compound unique") {
    assert(result(Seq(Unique(Seq("symbol", "high")))).head.passed)
  }

  test("unique_approx: tolerance-banded HLL twin of Unique") {
    // unique key: estimated dup mass ~0, inside any band
    assert(result(Seq(UniqueApprox(Seq("id")))).head.passed)
    // massive duplication blows through the band regardless of sketch
    // noise: 1000 rows, 10 distinct keys -> ~99% dup mass vs 1% band
    val dups = (1L to 1000L).map(i => (i % 10, "x")).toDF("k", "pad")
    val r = Validator.run(dups, Seq(UniqueApprox(Seq("k")))).head
    assert(!r.passed && r.violations > 900,
      s"expected ~990 estimated duplicates, got ${r.violations}")
    // null keys are excluded, matching exact Unique's contract
    val withNulls = Seq(Option(1L), Option(2L), None, None)
      .toDF("k")
    assert(Validator.run(withNulls, Seq(UniqueApprox(Seq("k")))).head.passed)
    // the whole point at scale: inside a multi-rule single-scan suite
    // the approx rule keeps the plan a plain two-level (partial+final)
    // HLL aggregate -- no distinct at all, hence no full-key
    // re-aggregation (one distinct) and no Expand (several). The
    // exact rule is the one that pays: its plan carries
    // count(distinct ...), which groups EVERY row by the key before
    // the final aggregate -- a corpus-keyed shuffle the sketch path
    // never does.
    val suite = Seq(NotNull("k"), UniqueApprox(Seq("k")))
    val exprs = suite.collect { case a: AggRule => a }.zipWithIndex
      .map { case (a, i) => a.violations.cast("long").as(s"v$i") }
    val approxPlan = dups.agg(exprs.head, exprs.tail: _*)
      .queryExecution.sparkPlan.toString
    assert(!approxPlan.contains("count(distinct") &&
      !approxPlan.contains("Expand"),
      "UniqueApprox in a multi-rule agg must stay distinct-free")
    val exactExprs = Seq(NotNull("k"), Unique(Seq("k")))
      .collect { case a: AggRule => a }.zipWithIndex
      .map { case (a, i) => a.violations.cast("long").as(s"v$i") }
    val exactPlan = dups.agg(exactExprs.head, exactExprs.tail: _*)
      .queryExecution.sparkPlan.toString
    assert(exactPlan.contains("count(distinct"),
      "control: the exact rule is the one that pays the keyed re-aggregation")
  }

  test("row_count_between") {
    assert(result(Seq(RowCountBetween(1, 10))).head.passed)
    assert(!result(Seq(RowCountBetween(5, 10))).head.passed)
  }

  test("values_in_set ignores nulls") {
    val r = result(Seq(ValuesInSet("symbol", Seq("AAPL", "MSFT")))).head
    assert(r.passed)
    val r2 = result(Seq(ValuesInSet("symbol", Seq("AAPL")))).head
    assert(!r2.passed && r2.violations === 1)
  }

  test("values_between") {
    assert(result(Seq(ValuesBetween("high", 0, 100))).head.passed)
    val r = result(Seq(ValuesBetween("high", 0, 25))).head
    assert(!r.passed && r.violations === 2)
  }

  test("matches_prefix ignores nulls and counts non-matching rows") {
    assert(result(Seq(MatchesPrefix("symbol", ""))).head.passed)
    val r = result(Seq(MatchesPrefix("symbol", "A"))).head
    assert(!r.passed && r.violations === 1) // MSFT; null symbol excluded
  }

  test("matches_regex ignores nulls and counts non-matching rows") {
    assert(result(Seq(MatchesRegex("symbol", "^[A-Z]+$"))).head.passed)
    val r = result(Seq(MatchesRegex("symbol", "^A"))).head
    assert(!r.passed && r.violations === 1) // MSFT; null symbol excluded
  }

  test("pair_a_ge_b") {
    val r = result(Seq(PairGreater("high", "low"))).head
    assert(!r.passed && r.violations === 1)
  }

  test("all rules run in one pass and enforce throws on failure") {
    val rules = Seq(NotNull("symbol"), Unique(Seq("id")), PairGreater("high", "low"))
    assert(Validator.run(df, rules).size === 3)
    assertThrows[IllegalStateException](Validator.enforce(df, rules, "suite"))
  }

  test("referenced_in counts FK orphans via a broadcast anti-join; NULLs exempt") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = Seq("AAPL", "MSFT").toDF("sym")
    // df symbols: AAPL, MSFT, NULL, GOOG-ish? inspect: rows carry a
    // NULL symbol and at least one value outside the dim
    val r = Validator.run(df, Seq(ReferencedIn("symbol", dim, "sym")))
    assert(r.size === 1 && r.head.rule === "referenced_in")
    val expected = df.filter(col("symbol").isNotNull)
      .filter(!col("symbol").isin("AAPL", "MSFT")).count()
    assert(r.head.violations === expected)
    assert(r.head.passed === (expected == 0))
    // a complete dim passes even with NULL FKs present
    val full = df.filter(col("symbol").isNotNull).select(col("symbol").as("sym")).distinct()
    assert(Validator.run(df, Seq(ReferencedIn("symbol", full, "sym"))).head.passed)
  }
}
