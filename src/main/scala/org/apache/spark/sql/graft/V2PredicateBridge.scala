package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions.{col, lit, not => fnot}
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources._

/** Translates DataSourceV2 [[Predicate]]s (what Spark hands a
  * `SupportsDeleteV2` table for `DELETE FROM`/`TRUNCATE`) into
  * [[Column]] expressions the versioned store's `deleteWhere` can
  * evaluate. The route is Spark's own v2→v1 lowering
  * ([[PredicateUtils.toV1]]) followed by a v1-`Filter`→`Column`
  * rebuild — both halves total functions over the supported shapes,
  * `None` everywhere else, so a caller can report translatability
  * BEFORE mutating anything (`canDeleteWhere` contract: reject the
  * statement up front rather than half-apply it).
  *
  * Semantics note: SQL DELETE removes rows where the predicate is
  * TRUE (not NULL); the store's `deleteWhere` coalesces a NULL
  * condition to false, so the composition is exactly SQL semantics.
  */
object V2PredicateBridge {

  /** Conjunction of all predicates, or None if ANY fails to
    * translate (a partial conjunction would delete too much). */
  def conjunction(predicates: Seq[Predicate]): Option[Column] = {
    val cols = predicates.map(p => PredicateUtils.toV1(p).flatMap(column))
    if (cols.exists(_.isEmpty)) None
    else Some(cols.flatten.reduceOption(_ && _).getOrElse(lit(true)))
  }

  /** One v1 [[Filter]] as a [[Column]]; None for shapes with no
    * faithful Column form. v1 attribute names are dot-joined paths —
    * the store's tables are flat, so the name is used verbatim. */
  def column(f: Filter): Option[Column] = f match {
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    // IN () is unrepresentable in a Column; an empty isin() is
    // false-or-null, which deleteWhere's coalesce makes exactly
    // SQL's "delete nothing"
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- column(l); b <- column(r)) yield a && b
    case Or(l, r) => for (a <- column(l); b <- column(r)) yield a || b
    case Not(c) => column(c).map(fnot)
    case _ => None
  }
}
