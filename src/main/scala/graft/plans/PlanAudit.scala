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
  *    avoid. "Directly over" means the aggregate sits on the window's
  *    OWN input chain, walked through single-child nodes only
  *    (exchange / sort / project / filter); the walk stops at joins
  *    and unions, so an aggregate buried in one branch of a join
  *    cannot exempt a window whose other branch is corpus-sized.
  *
  * The audit reads the pre-AQE physical plan (`sparkPlan`): AQE can
  * only narrow exchanges at runtime, never un-plan a cartesian or a
  * global window, so findings here are structural.
  *
  * A fourth shape is invisible to plan structure: a PARTITIONED window
  * whose key has so few distinct values that at scale each partition
  * is corpus-sized anyway (rank over 5 event types = five tasks
  * sorting 20 TB each). [[auditWindowCardinality]] catches it by
  * MEASURING: for every keyed window whose input is not already
  * aggregate- or top-n-bounded, it runs one approx_count_distinct of
  * the partition key over the window's input and flags NDV below the
  * session's parallelism. Runs jobs, so it is a separate opt-in entry,
  * not part of the static [[audit]].
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
          !aggBoundedChain(w.child) =>
        Finding("global-window", summarize(w))
    }
    cartesians ++ globalSorts ++ globalWindows
  }

  /** Is this plan's output bounded by an aggregate ON ITS OWN spine?
    * Walks down through single-child nodes only: a join/union/leaf
    * ends the walk unbounded, so `corpus JOIN tiny-agg` does NOT
    * count as aggregate-bounded (the round-8 lint accepted it -- a
    * false negative this chain walk closes). */
  private def aggBoundedChain(p: SparkPlan): Boolean =
    if (isAggregate(p)) true
    else p.children match {
      case Seq(only) => aggBoundedChain(only)
      case _ => false
    }

  /** The measured rule: `low-card-window` -- a keyed window whose
    * partition-key NDV is below `minNdv` (default: the session's
    * default parallelism) and whose input is neither aggregate-bounded
    * nor a two-stage top-n final. At 100 TB such a window concentrates
    * the corpus onto NDV tasks no matter how many executors exist.
    *
    * The two-stage exemption: a Filter on the input chain below which
    * (still chain-walked) sits another Window is the salted-final
    * idiom (shard-local top-n feeds a per-key final whose input is
    * <= salt * n rows per key BY CONSTRUCTION -- sourceCapOf /
    * groupSampleOf / the retrieval top-k). NDV cannot see that row
    * bound, so the shape is recognized structurally instead.
    *
    * Runs one approx_count_distinct JOB per un-exempt keyed window
    * (deduped by canonicalized input+key), so this is the
    * pre-production gate, not a free static lint. */
  def auditWindowCardinality(df: DataFrame,
      minNdv: Option[Long] = None): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.functions.{approx_count_distinct, struct}
    import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
    val spark = df.sparkSession
    val floor = minNdv.getOrElse(
      spark.sparkContext.defaultParallelism.toLong)
    def chainHasWindow(p: LogicalPlan): Boolean = p match {
      case _: LWindow => true
      case u if u.children.size == 1 => chainHasWindow(u.children.head)
      case _ => false
    }
    def boundedChain(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case f: Filter => chainHasWindow(f.child) || boundedChain(f.child)
      case u if u.children.size == 1 => boundedChain(u.children.head)
      case _ => false
    }
    val suspects = df.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.nonEmpty && !boundedChain(w.child) => w
    }.distinctBy(w =>
      (w.partitionSpec.map(_.canonicalized), w.child.canonicalized))
    suspects.flatMap { w =>
      val key = struct(w.partitionSpec.map(ColumnBridge.column): _*)
      val ndv = DatasetBridge.ofRows(spark, w.child)
        .select(approx_count_distinct(key).as("ndv")).head().getLong(0)
      if (ndv < floor)
        Some(Finding("low-card-window",
          s"partition NDV ~$ndv < $floor on key " +
            s"(${w.partitionSpec.mkString(", ").take(80)})"))
      else None
    }
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
