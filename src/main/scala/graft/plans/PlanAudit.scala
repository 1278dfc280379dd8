package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
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
  *    avoid. NOTE: the allowed shape still makes Spark log a
  *    `WindowExec: No Partition Defined ... serious performance
  *    degradation` warning at runtime — full-suite verify prints a
  *    handful of them, all from exact-computing ORACLE-GATE twins
  *    (a4_percentiles-style sorted collection over a per-group
  *    aggregate). That is expected and deliberate: the twin exists to
  *    hash-pin the sketch query's algebra, bench measures the sketch
  *    production twin (a4_percentiles_approx), and the window's input
  *    is group-cardinality rows by construction. Do not "fix" the
  *    warning by repartitioning the twin. "Directly over" means the
  *    aggregate sits on the window's
  *    OWN input chain, walked through single-child nodes only
  *    (exchange / sort / project / filter); the walk stops at joins
  *    and unions, so an aggregate buried in one branch of a join
  *    cannot exempt a window whose other branch is corpus-sized.
  *  - `oversized-broadcast`: a join carrying an explicit BROADCAST
  *    hint whose hinted side's plan-ESTIMATED size exceeds
  *    [[BroadcastGateBytes]]. Auto-planned broadcasts are already
  *    guarded by `spark.sql.autoBroadcastJoinThreshold`; a hint
  *    bypasses every guard (Spark honors it at any size, up to the
  *    hard 8 GB / 512 M-row executor failure), so the lint re-imposes
  *    a memory ceiling from the optimizer's own size estimate. The
  *    rule only fires where that estimate MEANS something: a side
  *    that is a scan / filter / project chain over leaves, whose
  *    sizeInBytes derives from real file sizes. A side containing a
  *    join, aggregate, generator, or window is exempt -- size-only
  *    propagation through those is garbage (joins MULTIPLY child
  *    estimates; a 5-row query-expansion side here measured 1e644
  *    bytes), and the group-bounded broadcasts this engine builds
  *    (centroid tables, query sets, offset rows) all have exactly
  *    that shape. Catches the realistic hint misuse -- broadcasting a
  *    big base table -- and leaves derived sides to the measured
  *    audits.
  *
  * The audit reads the pre-AQE physical plan (`sparkPlan`) plus the
  * optimized logical plan's statistics: AQE can only narrow exchanges
  * at runtime, never un-plan a cartesian, a global window, or a
  * hinted broadcast, so findings here are structural.
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

  /** Hinted-broadcast estimate ceiling: one build-side copy must sit
    * in every executor's storage memory next to the running tasks; a
    * 1 GiB estimate is past what any sane executor profile spares,
    * and an order of magnitude past any sensible auto threshold. */
  val BroadcastGateBytes: Long = 1L << 30

  /** All scale findings in `df`'s compiled plan (empty = clean). */
  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.sparkPlan) ++
      auditBroadcastHints(df.queryExecution.optimizedPlan)

  /** The `oversized-broadcast` rule (static -- estimates only, no
    * jobs). Hints are read off the optimized plan's Join nodes, where
    * EliminateResolvedHint has already attached them to the join that
    * will consume them. */
  private[plans] def auditBroadcastHints(root: LogicalPlan,
      maxBytes: Long = BroadcastGateBytes): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Window => LWindow}
    def hintedBroadcast(h: Option[HintInfo]): Boolean =
      h.exists(_.strategy.contains(BROADCAST))
    // scan-derived estimates only: size propagation through joins /
    // aggregates / generators is not evidence of anything
    def scanDerived(p: LogicalPlan): Boolean = p.collectFirst {
      case n @ (_: Join | _: Aggregate | _: Generate | _: LWindow) => n
    }.isEmpty
    root.collect { case j: Join =>
      Seq(j.left -> j.hint.leftHint, j.right -> j.hint.rightHint).collect {
        case (side, h) if hintedBroadcast(h) && scanDerived(side) &&
            side.stats.sizeInBytes > BigInt(maxBytes) =>
          Finding("oversized-broadcast",
            s"BROADCAST hint on a side estimated " +
              s"${side.stats.sizeInBytes} bytes (> $maxBytes): " +
              side.simpleString(2).linesIterator.next().take(100))
      }
    }.flatten
  }

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

  /** The second measured rule: `skewed-shuffle-join` -- an equi-join
    * that will actually SHUFFLE (no broadcast hint, and no side both
    * under `spark.sql.autoBroadcastJoinThreshold` and legal to build
    * for the join type) on a key where one value holds more than
    * `maxShare` of a side's rows. At scale that value's rows all land
    * in one reduce task regardless of executor count -- the signal to
    * salt (the LSH joins' discipline) or pre-aggregate. AQE's skew
    * mitigation only splits SORT-MERGE partitions after the fact and
    * cannot fix a skewed build side of a shuffled hash join, so the
    * lint reports the key so the FIX can be algebraic.
    *
    * Measurement is one bounded SpaceSaving sketch pass per distinct
    * shuffling side (map-side combinable; top-1 frequency is exact
    * while side NDV <= `capacity` and an upper bound beyond it --
    * upper bound means the lint can over-flag, never under-flag, past
    * capacity). Sides measuring under `minRows` never flag: shares
    * are meaningless on fixture-sized inputs. Runs jobs -- opt-in
    * pre-production gate like [[auditWindowCardinality]], not part of
    * the static [[audit]]. */
  def auditJoinSkew(df: DataFrame, maxShare: Double = 0.2,
      minRows: Long = 1000L, capacity: Int = 4096): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.{Cross, ExistenceJoin, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
    import org.apache.spark.sql.functions.{col, count, lit, struct}
    import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
    import graft.functions.TopKFreq.topkFreq
    import graft.ops.Hashing.h15
    val spark = df.sparkSession
    val thresh = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def equiKeys(j: Join): Seq[(Expression, Expression)] =
      j.condition.toSeq.flatMap(conjuncts).collect {
        case EqualTo(l, r) if l.references.subsetOf(j.left.outputSet) &&
            r.references.subsetOf(j.right.outputSet) => (l, r)
        case EqualTo(l, r) if r.references.subsetOf(j.left.outputSet) &&
            l.references.subsetOf(j.right.outputSet) => (r, l)
      }
    def small(p: LogicalPlan): Boolean =
      thresh > 0 && p.stats.sizeInBytes <= BigInt(thresh)
    def hinted(h: Option[HintInfo]): Boolean =
      h.exists(_.strategy.contains(BROADCAST))
    // a join only shuffles when NO side can broadcast: build-right is
    // legal for inner/cross/left-shaped joins, build-left for
    // inner/cross/right-outer (full outer never broadcasts)
    def willBroadcast(j: Join): Boolean = {
      val buildRightOk = j.joinType match {
        case Inner | Cross | LeftOuter | LeftSemi | LeftAnti |
             _: ExistenceJoin => true
        case _ => false
      }
      val buildLeftOk = j.joinType match {
        case Inner | Cross | RightOuter => true
        case _ => false
      }
      (buildRightOk && (small(j.right) || hinted(j.hint.rightHint))) ||
        (buildLeftOk && (small(j.left) || hinted(j.hint.leftHint)))
    }
    val sides = df.queryExecution.optimizedPlan.collect {
      case j: Join if !willBroadcast(j) && equiKeys(j).nonEmpty =>
        val ks = equiKeys(j)
        Seq(j.left -> ks.map(_._1), j.right -> ks.map(_._2))
    }.flatten.distinctBy { case (p, ks) =>
      (p.canonicalized, ks.map(_.canonicalized))
    }
    sides.flatMap { case (plan, keys) =>
      val keyCol =
        if (keys.size == 1) ColumnBridge.column(keys.head).cast("string")
        else struct(keys.map(ColumnBridge.column): _*).cast("string")
      val keyed = DatasetBridge.ofRows(spark, plan)
        .select(keyCol.as("key_value"))
        .withColumn("kh", h15(col("key_value")))
      val row = keyed
        .agg(topkFreq(col("kh"), 1, capacity).as("top"),
          count(lit(1)).as("n")).head()
      val n = row.getLong(1)
      val top = row.getSeq[org.apache.spark.sql.Row](0)
      if (n < minRows || top.isEmpty) None
      else {
        val cnt = top.head.getLong(1)
        val share = cnt.toDouble / n
        if (share <= maxShare) None
        else {
          // recover the readable value only for the (rare) flagged side
          val v = keyed.filter(col("kh") === lit(top.head.getLong(0)))
            .select(col("key_value")).head().getString(0)
          Some(Finding("skewed-shuffle-join",
            f"key (${keys.mkString(", ").take(60)}) value '$v' holds " +
              f"~${share * 100}%.1f%% of $n rows -- salt or pre-aggregate"))
        }
      }
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
