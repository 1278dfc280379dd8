package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Graph analytics over edge lists -- the web-graph side of a
  * pretraining corpus pipeline (link-graph centrality is a standard
  * document-quality prior: pages that the graph endorses get sampled
  * up; see also [[DedupOps.connectedComponents]] for the dedup-graph
  * twin of this iterative shape).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic: ranks are bigint
  * micro-units at scale 1e12 and every division truncates. That makes
  * the iteration engine-exact -- summation order cannot perturb a
  * single unit, so the DuckDB oracle hash-matches bit-for-bit, the
  * thing no double-based PageRank can promise across engines. The
  * truncation loss (< 1 unit = 1e-12 of mass per node per round) is
  * far below any ranking-relevant signal.
  */
object GraphOps {

  /** Rank mass scale: 1.0 of probability mass = 1e12 units. */
  val Scale: Long = 1000000000000L

  /** Power iteration over a directed edge list (`src`, `dst`).
    * Callers must dedup edges. With `reclaimDangling = false` every
    * node must also have at least one out-edge (an undirected graph
    * fed as both directions satisfies this); with it TRUE, genuinely
    * directed graphs are valid input: the node spine covers src AND
    * dst, and each round reclaims the mass parked on out-edge-less
    * (dangling) nodes via one extra 1-row broadcast aggregate,
    * redistributing it uniformly -- the standard dangling-node
    * treatment, in the same exact integer arithmetic (`(85 * dm) div
    * (100 * n)` per node). Damping 0.85, teleport share 0.15, both
    * exact integer ops.
    *
    * Per round: contribution = rank div outdegree (a zero-join
    * projection -- the degree RIDES on the rank table, see the r15
    * note in the body), one fact-sized equi-join contribution-to-
    * edges, one map-side combinable sum per destination, one left
    * join back to the node spine (+ a 1-row filter-aggregate dangling
    * sum when reclaiming). The node count rides a 1-row broadcast (no
    * driver action), and lineage is cut per round exactly like the CC
    * loop -- at 100 TB each round is shuffle-bound on the edge join,
    * which is the optimal shape (PageRank IS repeated sparse matvec).
    */
  def pageRank(edges0: DataFrame, iters: Int,
      reclaimDangling: Boolean = false): DataFrame = {
    val edges = DedupOps.materializeOnce(edges0.select(col("src"), col("dst")))
    // r15 (guide §2.4: remove shuffles outright): the out-degree rides
    // ON the rank table instead of living in a separate loop-invariant
    // table. The old shape joined pr with deg every round to form the
    // contributions (one node-sized exchange pair per round) and, in
    // the dangling variant, anti-joined pr with deg again for the
    // parked mass (a second one); both are now zero-join projections
    // over pr itself (`deg IS NOT NULL` / `deg IS NULL`). Per round
    // the only joins left are the edge-sized contribution join (the
    // sparse matvec itself -- irreducible) and the node-spine left
    // join that rebuilds the rank table.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // node spine WITH degree: (id, deg) where deg is null on dangling
    // nodes (reclaim variant only -- without reclaim the spine is
    // exactly the src side, where deg is never null)
    val nodes = DedupOps.materializeOnce(
      if (reclaimDangling)
        edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id"))).distinct()
          .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      else deg.select(col("src").as("id"), col("deg")))
    val nn = nodes.agg(count(lit(1)).as("n"))
    var pr = DedupOps.materializeOnce(
      nodes.crossJoin(broadcast(nn))
        .select(col("id"), col("deg"), expr(s"${Scale}L div n").as("rank")))
    // the last MATERIALIZED rank table -- the frame whose checkpoint
    // blocks the next materialization supersedes (pr itself holds a
    // lazy plan on odd rounds, where releasing would free nothing)
    var lastMat = pr
    for (i <- 1 to iters) {
      // joins resolve through DATASET aliases (p/e/c/v/i): rounds
      // without a lineage cut carry nodes attribute ids inside pr's
      // plan, so column-object conditions would be ambiguous
      // self-join references
      val contrib = pr.as("p").filter(col("p.deg").isNotNull)
        .selectExpr("p.id AS csrc", "p.rank div p.deg AS contrib")
      val incoming = edges.as("e").join(contrib.as("c"), expr("e.src = c.csrc"))
        .groupBy(col("e.dst").as("ddst"))
        .agg(sum(col("c.contrib")).as("inc"))
      val base = nodes.as("v")
        .join(incoming.as("i"), expr("v.id = i.ddst"), "left")
        .crossJoin(broadcast(nn))
      val next =
        if (reclaimDangling) {
          // the round's dangling mass: rank parked on nodes with no
          // out-edge (now a 1-row filter-aggregate over pr, broadcast)
          val dm = pr.as("p").filter(col("p.deg").isNull)
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
          base.crossJoin(broadcast(dm))
            .selectExpr("v.id AS id", "v.deg AS deg",
              s"(${Scale}L * 15) div (100 * n)" +
                " + (85 * coalesce(i.inc, 0L)) div 100" +
                " + (85 * dm) div (100 * n) AS rank")
        } else base.selectExpr("v.id AS id", "v.deg AS deg",
          s"(${Scale}L * 15) div (100 * n)" +
            " + (85 * coalesce(i.inc, 0L)) div 100 AS rank")
      // lineage cut every second round: two rounds of joins stay well
      // inside planner limits, and each skipped materialization saves
      // a full pass over the rank table
      if (i % 2 == 0 || i == iters) {
        // m is eager: once it exists, the previous checkpoint's
        // blocks are unreferenced and can be freed
        val m = DedupOps.materializeOnce(next)
        DedupOps.releaseOnce(lastMat)
        lastMat = m
        pr = m
      } else pr = next
    }
    // the returned rank table is materialized: the loop-invariant
    // edge/node checkpoints are no longer referenced and must not
    // stay resident for the session
    DedupOps.releaseOnce(edges)
    DedupOps.releaseOnce(nodes)
    pr.select(col("id"), col("rank"))
  }

  /** PageRank over the customer-supplier transaction graph: an
    * undirected bipartite edge per (customer, supplier) pair that
    * traded (orders joined to lineitem, both directions emitted so no
    * node dangles; supplier ids offset into their own range). 8
    * rounds -- past the point where top-rank ordering stabilizes on
    * this graph. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val fwd = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(100000L)).as("dst"))
      .distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    pageRank(edges, iters = 8)
  }

  /** PageRank over the DIRECTED customer->supplier graph: only the
    * forward edge per trading pair, so every supplier node is a true
    * SINK (no out-edges) -- the input shape [[pageRank]]'s
    * `reclaimDangling` exists for. 6 rounds. Roughly half the total
    * mass parks on the supplier side each round and must be reclaimed;
    * without the reclaim term ranks would leak to the teleport floor
    * and the oracle (which models the reclaim exactly) would diverge
    * in round 1. */
  def graphPagerankDangling(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(100000L)).as("dst"))
      .distinct()
    pageRank(edges, iters = 6, reclaimDangling = true)
  }

  /** The dangling twin as chained CTEs: per round a 1-row dangling-
    * mass CTE (rank parked on out-edge-less nodes) feeds the uniform
    * reclaim term, mirroring the engine's integer formula exactly. */
  val graphPagerankDanglingSql: String = {
    def step(prev: String, cur: String, dmc: String): String =
      s"""$dmc AS (
         SELECT CAST(COALESCE(sum(r.rank), 0) AS BIGINT) AS dm
         FROM $prev r LEFT JOIN deg d ON r.id = d.src
         WHERE d.src IS NULL),
       $cur AS (
         SELECT n.id,
                CAST(($Scale * 15) // (100 * (SELECT n FROM nn))
                     + (85 * COALESCE(i.s, 0)) // 100
                     + (85 * (SELECT dm FROM $dmc))
                       // (100 * (SELECT n FROM nn)) AS BIGINT) AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           FROM $prev r JOIN deg d ON r.id = d.src
                        JOIN edges e ON e.src = r.id
           GROUP BY e.dst) i ON n.id = i.id)"""
    val steps = (1 to 6).map(i => step(s"r${i - 1}", s"r$i", s"dm$i")).mkString(",\n")
    s"""WITH edges AS (
         SELECT DISTINCT o_custkey AS src, l_suppkey + 100000 AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
       nn AS (SELECT count(*) AS n FROM nodes),
       r0 AS (SELECT id, CAST($Scale // (SELECT n FROM nn) AS BIGINT) AS rank
              FROM nodes),
       $steps
       SELECT id, rank FROM r6"""
  }

  /** The same 8 rounds as chained CTEs; all integer ops (`//` floors,
    * Spark's `div` truncates -- identical on the all-positive ranks),
    * final cast pins DuckDB's hugeint sums back to bigint. */
  val graphPagerankSql: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         SELECT n.id,
                CAST(($Scale * 15) // (100 * (SELECT n FROM nn))
                     + (85 * COALESCE(i.s, 0)) // 100 AS BIGINT) AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           FROM $prev r JOIN deg d ON r.id = d.src
                        JOIN edges e ON e.src = r.id
           GROUP BY e.dst) i ON n.id = i.id)"""
    val steps = (1 to 8).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH fwd AS (
         SELECT DISTINCT o_custkey AS src, l_suppkey + 100000 AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       edges AS (SELECT src, dst FROM fwd
                 UNION ALL SELECT dst AS src, src AS dst FROM fwd),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       nodes AS (SELECT DISTINCT src AS id FROM edges),
       nn AS (SELECT count(*) AS n FROM nodes),
       r0 AS (SELECT id, CAST($Scale // (SELECT n FROM nn) AS BIGINT) AS rank
              FROM nodes),
       $steps
       SELECT id, rank FROM r8"""
  }

  // ----------------------------------------------- label propagation

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007) over an undirected edge list fed as BOTH directions:
    * labels start as node ids; each round every node adopts the most
    * frequent label among its neighbors, ties broken toward the
    * SMALLEST label -- the deterministic variant (classic LPA breaks
    * ties randomly, which no cross-engine oracle could pin). Fixed
    * round count: LPA's fixpoint can oscillate under synchronous
    * update, so a bounded sweep is the honest distributed contract.
    *
    * Per round: one edge-sized equi-join labels-to-edges, one
    * map-side-combinable (node, label) count, then the argmax per
    * node as `max(struct(cnt, -label))` -- a pure aggregate, no
    * window shuffle; -label turns "min label on cnt ties" into max
    * semantics. Same lineage-cut discipline as [[pageRank]]. */
  def labelPropagation(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = DedupOps.materializeOnce(edges0.select(col("src"), col("dst")))
    val nodes = DedupOps.materializeOnce(
      edges.select(col("src").as("id")).distinct())
    var lab = nodes.select(col("id"), col("id").as("label"))
    var lastMat: DataFrame = null
    for (i <- 1 to iters) {
      val votes = edges.as("e")
        .join(lab.as("l"), expr("e.src = l.id"))
        .groupBy(col("e.dst").as("vid"), col("l.label").as("vlabel"))
        .agg(count(lit(1)).as("cnt"))
      val next = votes
        .groupBy(col("vid").as("id"))
        .agg(max(struct(col("cnt"), (-col("vlabel")).as("neg"))).as("top"))
        .select(col("id"), (-col("top.neg")).as("label"))
      if (i % 2 == 0 || i == iters) {
        val m = DedupOps.materializeOnce(next)
        if (lastMat != null) DedupOps.releaseOnce(lastMat)
        lastMat = m
        lab = m
      } else lab = next
    }
    DedupOps.releaseOnce(edges)
    DedupOps.releaseOnce(nodes)
    lab
  }

  /** Multi-source BFS hop distances over a directed edge list:
    * (id, hops) for every node within `maxHops` of any source, hops
    * = the MINIMUM hop count (0 for the sources themselves).
    *
    * Frontier iteration, the scalable BFS: per round one
    * frontier-sized equi-join into the edge list, a distinct, and an
    * anti-join against the visited set -- cost tracks the FRONTIER
    * (nodes first reached this round), never walks. The recursive-
    * CTE oracle enumerates bounded walks instead; both compute the
    * same min-hop function, from opposite ends of the work/expressiveness
    * trade (walk enumeration would be exponential on the engine's
    * scale, frontier BFS is inexpressible in one SQL query).
    * Early-exits when a frontier empties (the `isEmpty` probe is one
    * bounded job per round, rounds <= maxHops).
    *
    * Use cases at corpus scale: contamination spread from flagged
    * docs over the dedup/link graph, crawl-frontier depth, "within k
    * citation hops of a benchmark" exclusion zones. */
  def bfsHops(edges0: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val edges = DedupOps.materializeOnce(edges0.select(col("src"), col("dst")))
    // hop-0 layer materialized too: every layer of the returned union
    // is then a bare checkpoint, so callers may release their edge /
    // source inputs as soon as this returns
    var dist = DedupOps.materializeOnce(
      sources.select(col("id")).distinct()
        .withColumn("hops", lit(0).cast("int")))
    var frontier = dist
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = DedupOps.materializeOnce(
        edges.join(frontier.select(col("id")), col("src") === col("id"))
          .select(col("dst").as("id")).distinct()
          .join(dist, Seq("id"), "left_anti")
          .withColumn("hops", lit(h).cast("int")))
      if (next.isEmpty) done = true
      else {
        dist = dist.unionAll(next)
        frontier = next
      }
      h += 1
    }
    DedupOps.releaseOnce(edges)
    dist
  }

  /** Oracle-gated binding: hop distances along the per-customer
    * ORDER CHAIN (consecutive orders by date linked bidirectionally
    * -- a disjoint union of path graphs, so hop counts exercise the
    * full 0..6 range instead of collapsing into a dense graph's
    * 2-hop diameter), from the globally smallest order key. The
    * chain window partitions by customer -- per-partition state is
    * one customer's orders, never corpus-bounded. */
  def graphBfsHops(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c")).orderBy(col("d"), col("k"))
    val rn = DedupOps.materializeOnce(
      Tables.orders(s, dir)
        .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
          col("o_orderdate").as("d"))
        .withColumn("rn", row_number().over(w)))
    val fwd = rn.as("a")
      .join(rn.as("b"), expr("a.c = b.c AND b.rn = a.rn + 1"))
      .selectExpr("a.k AS src", "b.k AS dst")
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val out = bfsHops(edges, edges.agg(min(col("src")).as("id")), maxHops = 6)
    DedupOps.releaseOnce(rn)
    out
  }

  /** The same min-hop function as a bounded-walk recursive CTE (walk
    * counts stay trivial on a path graph; the depth bound terminates
    * cycles). */
  val graphBfsHopsSql: String =
    """WITH RECURSIVE o AS (
         SELECT o_custkey AS c, o_orderkey AS k,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders),
       fwd AS (SELECT a.k AS src, b.k AS dst
               FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1),
       edges AS (SELECT src, dst FROM fwd
                 UNION ALL SELECT dst AS src, src AS dst FROM fwd),
       s AS (SELECT min(src) AS sid FROM edges),
       r AS (SELECT sid AS id, 0 AS hops FROM s
             UNION ALL
             SELECT e.dst, r.hops + 1
             FROM r JOIN edges e ON e.src = r.id WHERE r.hops < 6)
       SELECT id, CAST(min(hops) AS INT) AS hops FROM r GROUP BY id"""

  /** LPA over the high-quantity co-supplier graph (see
    * [[graphTriangles]]), 4 synchronous rounds, both edge directions
    * fed so the neighborhood is symmetric. */
  def graphLabelProp(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 46)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val fwd = hi.as("a")
      .join(hi.as("b"), expr("a.ok = b.ok AND a.sk < b.sk"))
      .selectExpr("a.sk AS src", "b.sk AS dst").distinct()
    labelPropagation(
      fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst"))),
      iters = 4)
  }

  /** The same 4 deterministic sweeps as chained CTEs; the oracle
    * breaks argmax ties with a row_number window (cnt DESC, label
    * ASC) -- value-identical to the engine's max(struct(cnt,
    * -label)) aggregate. */
  val graphLabelPropSql: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         SELECT vid AS id, vlabel AS label FROM (
           SELECT e.dst AS vid, l.label AS vlabel, count(*) AS cnt,
                  row_number() OVER (PARTITION BY e.dst
                    ORDER BY count(*) DESC, l.label ASC) AS rn
           FROM edges e JOIN $prev l ON e.src = l.id
           GROUP BY e.dst, l.label)
         WHERE rn = 1)"""
    val steps = (1 to 4).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
            FROM lineitem WHERE l_quantity >= 46),
       fwd AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
               FROM hi a JOIN hi b ON a.ok = b.ok AND a.sk < b.sk),
       edges AS (SELECT src, dst FROM fwd
                 UNION ALL SELECT dst AS src, src AS dst FROM fwd),
       r0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
       $steps
       SELECT id, label FROM r4"""
  }

  // --------------------------------------------------- triangle counting

  /** Sortable (degree, id) orientation key: ids must stay below 1e9
    * (testdata supplier/customer keys are far below; callers with
    * larger id spaces re-key first). */
  private val OrientK = 1000000000L

  /** Per-node triangle participation over an UNDIRECTED canonical
    * edge list (`u` < `v`, deduped) -- the local-clustering signal
    * (n_tri vs the wedge capacity deg*(deg-1)/2) that spam/link-farm
    * quality priors read. Output: (node_id, n_tri, n_wedges), one row
    * per node of the graph.
    *
    * Shape: DEGREE ORIENTATION, the standard distributed-triangle
    * trick (MPC/vertex-ordering literature; same algorithm Spark's
    * GraphX LPA-free triangleCount uses) -- each undirected edge is
    * directed from its lower to its higher endpoint in the total
    * order (deg, id). Every triangle then has exactly ONE "apex" node
    * with two out-edges, so the wedge self-join `o(a,b) x o(a,c),
    * key(b) < key(c)` enumerates each triangle once, and a LEFT SEMI
    * probe of the oriented edge set on (b, c) confirms it. Out-degree
    * under this orientation is bounded by O(sqrt(2m)) regardless of
    * raw degree skew, so the wedge fan-out is at most m^1.5 even on a
    * power-law graph whose highest-degree hub would make the naive
    * neighbor self-join quadratic: the orientation join is exactly
    * what makes this survive a web-scale graph. All joins are
    * equi-joins (PlanSpec-pinnable: no cartesian anywhere); the
    * orientation key rides each edge row so the wedge join needs no
    * extra degree lookup. */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    val edges = DedupOps.materializeOnce(edges0.select(col("u"), col("v")))
    val deg = DedupOps.materializeOnce(
      edges.select(col("u").as("id"))
        .unionAll(edges.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")))
    def key(d: String, n: String) = s"$d.deg * ${OrientK}L + $n"
    val lower = s"${key("du", "e.u")} < ${key("dv", "e.v")}"
    val o = DedupOps.materializeOnce(
      edges.as("e")
        .join(deg.as("du"), expr("e.u = du.id"))
        .join(deg.as("dv"), expr("e.v = dv.id"))
        .selectExpr(
          s"CASE WHEN $lower THEN e.u ELSE e.v END AS src",
          s"CASE WHEN $lower THEN e.v ELSE e.u END AS dst",
          s"CASE WHEN $lower THEN ${key("dv", "e.v")}" +
            s" ELSE ${key("du", "e.u")} END AS kdst"))
    val wedges = o.as("o1")
      .join(o.as("o2"), expr("o1.src = o2.src AND o1.kdst < o2.kdst"))
      .selectExpr("o1.src AS a", "o1.dst AS b", "o2.dst AS c")
    // (src, dst) is unique in o (edges are distinct, orientation is a
    // bijection), so the semi join is a pure existence probe
    val tri = wedges.as("w")
      .join(o.as("o3"), expr("w.b = o3.src AND w.c = o3.dst"), "left_semi")
    val perNode = tri.selectExpr("a AS id")
      .unionAll(tri.selectExpr("b AS id"))
      .unionAll(tri.selectExpr("c AS id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val out = deg.as("d")
      .join(perNode.as("p"), expr("d.id = p.id"), "left")
      .selectExpr("d.id AS node_id",
        "CAST(coalesce(p.n_tri, 0L) AS BIGINT) AS n_tri",
        "CAST(d.deg * (d.deg - 1) div 2 AS BIGINT) AS n_wedges")
    DedupOps.releaseOnce(edges)
    out
  }

  /** Triangle counts over the high-quantity co-supplier graph: two
    * suppliers are adjacent when they both ship a >= 46-quantity item
    * on the same order (the quantity floor keeps the graph sparse --
    * the co-occurrence self-join is bounded per order by order size,
    * a data constant, and the filter pushes down to the lineitem
    * scan). */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 46)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = hi.as("a")
      .join(hi.as("b"), expr("a.ok = b.ok AND a.sk < b.sk"))
      .selectExpr("a.sk AS u", "b.sk AS v").distinct()
    triangleCounts(edges)
  }

  /** The same orientation + wedge-probe pipeline as chained CTEs; all
    * integer arithmetic, so the per-node counts hash-match exactly. */
  val graphTrianglesSql: String =
    s"""WITH hi AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
            FROM lineitem WHERE l_quantity >= 46),
       edges AS (SELECT DISTINCT a.sk AS u, b.sk AS v
                 FROM hi a JOIN hi b ON a.ok = b.ok AND a.sk < b.sk),
       deg AS (SELECT id, count(*) AS deg
               FROM (SELECT u AS id FROM edges
                     UNION ALL SELECT v AS id FROM edges)
               GROUP BY id),
       o AS (SELECT CASE WHEN du.deg * $OrientK + e.u < dv.deg * $OrientK + e.v
                         THEN e.u ELSE e.v END AS src,
                    CASE WHEN du.deg * $OrientK + e.u < dv.deg * $OrientK + e.v
                         THEN e.v ELSE e.u END AS dst,
                    CASE WHEN du.deg * $OrientK + e.u < dv.deg * $OrientK + e.v
                         THEN dv.deg * $OrientK + e.v
                         ELSE du.deg * $OrientK + e.u END AS kdst
             FROM edges e JOIN deg du ON e.u = du.id
                          JOIN deg dv ON e.v = dv.id),
       tri AS (SELECT w.a, w.b, w.c
               FROM (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
                     FROM o o1 JOIN o o2
                       ON o1.src = o2.src AND o1.kdst < o2.kdst) w
               WHERE EXISTS (SELECT 1 FROM o o3
                             WHERE o3.src = w.b AND o3.dst = w.c)),
       pernode AS (SELECT id, count(*) AS n_tri FROM (
           SELECT a AS id FROM tri
           UNION ALL SELECT b AS id FROM tri
           UNION ALL SELECT c AS id FROM tri)
           GROUP BY id)
       SELECT d.id AS node_id,
              CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
              CAST(d.deg * (d.deg - 1) // 2 AS BIGINT) AS n_wedges
       FROM deg d LEFT JOIN pernode p ON d.id = p.id"""
}
