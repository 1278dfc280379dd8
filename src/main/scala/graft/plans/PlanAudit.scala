package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan lint: the three physical shapes that are fine at sf0.01 and
  * fatal at 100 TB, detected from a DataFrame's compiled plan so a
  * pipeline can refuse to ship them -- the same properties PlanSpec
  * pins per-query, packaged as a library check any user composition
  * can run (`PlanAudit.audit(df)` before a production submit, or
  * `assertScales(df)` as a test gate).
  *
  * Rules (each finding names the rule and the offending node):
  *  - `cartesian-product`: a CartesianProductExec anywhere. Deliberate
  *    tiny-side cross joins plan as BroadcastNestedLoopJoin and do NOT
  *    flag; a genuine cartesian of two unbroadcastable sides does.
  *  - `global-sort`: a SortExec with `global = true` -- every row of
  *    the input serializes through one total ordering (range exchange
  *    + final merge). Top-k queries that survive scale compile to
  *    TakeOrderedAndProject, which never plans a global SortExec.
  *  - `global-window`: a WindowExec with an empty partitionSpec whose
  *    input is NOT an aggregate -- Spark moves the entire relation
  *    into ONE task's window state. A global window directly over an
  *    aggregate is the broadcast-offsets idiom (bounded by group
  *    cardinality, tiny by contract) and is allowed; anything else is
  *    the single-task corpus sort this engine's samplers exist to
  *    avoid.
  *
  * The audit reads the pre-AQE physical plan (`sparkPlan`): AQE can
  * only narrow exchanges at runtime, never un-plan a cartesian or a
  * global window, so findings here are structural.
  */
object PlanAudit {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"[$rule] $node"
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectAll)) ++
      p.subqueries.asInstanceOf[Seq[Any]]
        .collect { case sp: SparkPlan => sp }.flatMap(collectAll)

  private def isAggregate(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _ => false
  }

  private def summarize(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(160)

  /** All scale findings in `df`'s compiled plan (empty = clean). */
  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.sparkPlan)

  private[plans] def auditPlan(root: SparkPlan): Seq[Finding] = {
    val nodes = collectAll(root)
    val cartesians = nodes.collect { case c: CartesianProductExec =>
      Finding("cartesian-product", summarize(c))
    }
    val globalSorts = nodes.collect { case s: SortExec if s.global =>
      Finding("global-sort", summarize(s))
    }
    val globalWindows = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          !collectAll(w.child).exists(isAggregate) =>
        Finding("global-window", summarize(w))
    }
    cartesians ++ globalSorts ++ globalWindows
  }

  /** Throw (with every finding listed) unless the plan is clean.
    * `allow` whitelists rule names a caller has judged acceptable
    * for a specific query (e.g. a deliberate driver-side global sort
    * on a provably tiny relation). */
  def assertScales(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = audit(df).filterNot(f => allow.contains(f.rule))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"plan fails the scale audit:\n  ${bad.mkString("\n  ")}")
  }
}
