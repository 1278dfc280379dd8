package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules -- the engine's re-expression of the
  * reference's Great Expectations suites (SURVEY.md S2.10,
  * docker/scripts/create_expectations.py). Each rule evaluates to a
  * pass/fail plus violation stats over a DataFrame.
  *
  * Scale design: every rule that can be phrased as a conditional
  * count compiles into ONE aggregate expression, and [[Validator.run]]
  * evaluates all of them in a single `agg(...)` pass -- one scan of
  * the table per suite, not one per rule (the reference runs 38
  * sequential Athena queries for the same checks,
  * IMPLEMENTATION_SUMMARY.md:131-132). Uniqueness rules use exact
  * count-distinct inside the same pass.
  */
sealed trait Rule {
  def name: String
  def describe: String
}

/** Q1: exact ordered column list. Schema-level (no scan). */
case class ColumnsMatchOrderedList(expected: Seq[String]) extends Rule {
  val name = "columns_match_ordered_list"
  def describe = expected.mkString(",")
}

/** Q9: column present. Schema-level. */
case class ColumnExists(column: String) extends Rule {
  val name = "column_exists"
  def describe = column
}

sealed trait AggRule extends Rule {
  /** Count of violating rows (0 = pass). */
  def violations: Column
}

/** Referential integrity: every non-NULL `column` value must exist in
  * `dim`'s `dimKey` (FK -> dimension). Cross-table, so it cannot ride
  * the single-scan aggregate: evaluated as one BROADCAST left-anti
  * join per rule (the dim's distinct key set is dimension-sized --
  * broadcastable at any fact scale; orphan detection never shuffles
  * the fact). */
case class ReferencedIn(column: String, dim: DataFrame, dimKey: String)
    extends Rule {
  val name = "referenced_in"
  def describe = s"$column -> $dimKey"
}

/** Q2 */
case class NotNull(column: String) extends AggRule {
  val name = "not_null"
  def describe = column
  def violations: Column = count(when(col(column).isNull, 1))
}

/** Q3 (single) / Q4 (compound): duplicates = total - distinct keys.
  * Rows with any null key column are excluded from uniqueness, like
  * SQL distinct-on-expression semantics in the reference's checks. */
case class Unique(columns: Seq[String]) extends AggRule {
  val name = if (columns.size == 1) "unique" else "compound_unique"
  def describe = columns.mkString(",")
  private def keyOk = columns.map(col(_).isNotNull).reduce(_ && _)
  def violations: Column =
    // when() nulls out rows with null key parts -- count_distinct
    // would otherwise count struct(null,...) as a distinct value
    count(when(keyOk, 1)) - count_distinct(when(keyOk, struct(columns.map(col): _*)))
}

/** Production twin of [[Unique]] for the 100 TB path: duplicate mass
  * estimated from ONE HLL sketch (`approx_count_distinct`) instead of
  * an exact distinct. Inside a multi-rule single-scan suite the exact
  * rule forces an Expand (each distinct aggregate re-emits every row)
  * plus a full-key shuffle; the sketch keeps the suite a one-pass,
  * map-side-combinable aggregate at any scale. Sketch error makes
  * "0 duplicates" unattestable, so the rule is a TOLERANCE gate:
  * it passes while the estimated duplicate mass stays within
  * `tolerancePct` of the key'd rows (HLL rsd default 5% => 1% is a
  * conservative floor for real dup detection; exact [[Unique]] stays
  * the oracle gate, this is what production monitoring runs).
  * Reported violations are 0 when inside the band, else the estimate
  * clamped above zero (the sketch can overshoot the true count). */
case class UniqueApprox(columns: Seq[String], tolerancePct: Double = 1.0,
    rsd: Double = 0.05) extends AggRule {
  val name = if (columns.size == 1) "unique_approx" else "compound_unique_approx"
  def describe = columns.mkString(",")
  private def keyOk = columns.map(col(_).isNotNull).reduce(_ && _)
  def violations: Column = {
    val keyed = count(when(keyOk, 1))
    val est = greatest(lit(0L),
      keyed - approx_count_distinct(
        when(keyOk, struct(columns.map(col): _*)), rsd))
    when(est * 100.0 <= keyed * tolerancePct, lit(0L)).otherwise(est)
  }
}

/** Q5: total row count within [min, max]. */
case class RowCountBetween(min: Long, max: Long) extends AggRule {
  val name = "row_count_between"
  def describe = s"[$min,$max]"
  def violations: Column =
    when(count(lit(1)).between(min, max), lit(0L)).otherwise(lit(1L))
}

/** Q6 */
case class ValuesInSet(column: String, set: Seq[Any]) extends AggRule {
  val name = "values_in_set"
  def describe = s"$column in ${set.mkString("{", ",", "}")}"
  def violations: Column =
    count(when(col(column).isNotNull && !col(column).isin(set: _*), 1))
}

/** Q7 */
case class ValuesBetween(column: String, lo: Double, hi: Double) extends AggRule {
  val name = "values_between"
  def describe = s"$column in [$lo,$hi]"
  def violations: Column =
    count(when(col(column) < lo || col(column) > hi, 1))
}

/** Q8: A >= B (or strict) pairwise per row. */
case class PairGreater(a: String, b: String, orEqual: Boolean = true) extends AggRule {
  val name = if (orEqual) "pair_a_ge_b" else "pair_a_gt_b"
  def describe = s"$a vs $b"
  def violations: Column =
    count(when(if (orEqual) col(a) < col(b) else col(a) <= col(b), 1))
}

/** F14/GX expect_..._to_match_like_pattern: non-null values must
  * start with `prefix` (the reference's `LIKE 'd%'` batch checks). */
case class MatchesPrefix(column: String, prefix: String) extends AggRule {
  val name = "matches_prefix"
  def describe = s"$column LIKE '$prefix%'"
  def violations: Column =
    count(when(col(column).isNotNull && !col(column).startsWith(prefix), 1))
}

/** GX expect_column_values_to_match_regex: non-null values must
  * match `pattern` (Java regex on the engine side; keep patterns to
  * the RE2-compatible subset if an oracle must reproduce them). */
case class MatchesRegex(column: String, pattern: String) extends AggRule {
  val name = "matches_regex"
  def describe = s"$column ~ $pattern"
  def violations: Column =
    count(when(col(column).isNotNull && !col(column).rlike(pattern), 1))
}

case class RuleResult(rule: String, detail: String, passed: Boolean, violations: Long, totalRows: Long)

object Validator {

  /** Evaluate a suite: schema rules driver-side, all aggregate rules
    * in one single-scan aggregation. */
  def run(df: DataFrame, rules: Seq[Rule]): Seq[RuleResult] = {
    val schemaResults = rules.collect {
      case r @ ColumnsMatchOrderedList(exp) =>
        RuleResult(r.name, r.describe, df.schema.fieldNames.toSeq == exp,
          if (df.schema.fieldNames.toSeq == exp) 0 else 1, -1)
      case r @ ColumnExists(c) =>
        val ok = df.schema.fieldNames.contains(c)
        RuleResult(r.name, r.describe, ok, if (ok) 0 else 1, -1)
    }
    val fkResults = rules.collect {
      case r @ ReferencedIn(c, dim, k) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(broadcast(dim.select(col(k).as("__fk")).distinct()),
            col(c) === col("__fk"), "left_anti")
          .count()
        RuleResult(r.name, r.describe, orphans == 0, orphans, -1)
    }
    val aggRules = rules.collect { case r: AggRule => r }
    val aggResults = if (aggRules.isEmpty) Nil else {
      val exprs = count(lit(1)).as("__total") +:
        aggRules.zipWithIndex.map { case (r, i) => r.violations.cast("long").as(s"__v$i") }
      val row: Row = df.agg(exprs.head, exprs.tail: _*).head()
      val total = row.getLong(0)
      aggRules.zipWithIndex.map { case (r, i) =>
        val v = row.getLong(i + 1)
        RuleResult(r.name, r.describe, v == 0, v, total)
      }
    }
    schemaResults ++ fkResults ++ aggResults
  }

  /** Convenience: throw if any rule failed (the reference's blocking
    * validation tasks, nasdaq_stock_pipeline_with_gx.py:217). */
  def enforce(df: DataFrame, rules: Seq[Rule], suite: String): Seq[RuleResult] = {
    val results = run(df, rules)
    val failed = results.filterNot(_.passed)
    if (failed.nonEmpty) {
      val msg = failed.map(r => s"${r.rule}(${r.detail}): ${r.violations} violations").mkString("; ")
      throw new IllegalStateException(s"validation suite '$suite' failed: $msg")
    }
    results
  }
}
