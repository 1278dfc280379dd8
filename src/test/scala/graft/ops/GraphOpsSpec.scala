package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural invariants for the fixed-point-integer PageRank; exact
  * value parity is the oracle gate's job (graph_pagerank). */
class GraphOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] =
    GraphOps.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("star graph: the hub outranks every leaf, ranks positive") {
    // undirected star 0 -- {1..5}, fed as both directions
    val fwd = (1L to 5L).map(i => (0L, i))
    val r = ranks(fwd ++ fwd.map(_.swap))
    assert(r.size === 6)
    assert(r.values.forall(_ > 0L))
    for (leaf <- 1L to 5L) assert(r(0L) > r(leaf),
      s"hub ${r(0L)} must outrank leaf $leaf ${r(leaf)}")
    // leaves are symmetric: identical integer ranks, no tie-noise
    assert(r.filterKeys(_ != 0L).values.toSet.size === 1)
  }

  test("mass conservation within truncation loss") {
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
    val edges = fwd ++ fwd.map(_.swap)
    val r = ranks(edges.distinct)
    val total = r.values.sum
    // each node loses < 1 unit per div, twice per round, 8 rounds
    val maxLoss = r.size.toLong * 2 * 8
    assert(total <= GraphOps.Scale)
    assert(total >= GraphOps.Scale - maxLoss,
      s"mass $total leaked more than truncation allows")
  }

  test("disconnected symmetric pairs rank identically") {
    val fwd = Seq((1L, 2L), (3L, 4L))
    val r = ranks(fwd ++ fwd.map(_.swap))
    assert(r.values.toSet.size === 1, s"all four nodes symmetric: $r")
  }

  private def danglingRanks(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] =
    GraphOps.pageRank(edges.toDF("src", "dst"), iters, reclaimDangling = true)
      .as[(Long, Long)].collect().toMap

  test("dangling reclaim: sink node appears in the spine and holds mass") {
    // directed chain 0 -> 1 -> 2; node 2 is a pure sink
    val r = danglingRanks(Seq((0L, 1L), (1L, 2L)))
    assert(r.size === 3, "sink must be part of the node spine")
    assert(r.values.forall(_ > 0L))
    // downstream of the chain accumulates: 2 > 1 > 0
    assert(r(2L) > r(1L) && r(1L) > r(0L), s"chain ordering violated: $r")
  }

  test("dangling reclaim conserves mass within truncation loss") {
    // star with all edges INTO the hub: every leaf dangles except none
    // have in-edges -- the worst reclaim case (hub parks ~all mass)
    val r = danglingRanks((1L to 5L).map(i => (i, 0L)))
    val total = r.values.sum
    // per round each node can truncate at the contrib div, the damp
    // div, and the reclaim div: 3 units x nodes x rounds
    val maxLoss = r.size.toLong * 3 * 8
    assert(total <= GraphOps.Scale)
    assert(total >= GraphOps.Scale - maxLoss,
      s"dangling mass $total leaked more than truncation allows")
  }

  test("reclaim on an out-edge-complete graph changes nothing") {
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val edges = fwd ++ fwd.map(_.swap)
    assert(ranks(edges) === danglingRanks(edges),
      "zero dangling mass must make reclaim a no-op")
  }

  test("LPA: two bridged triangles settle into two communities (hand-traced)") {
    // triangle {0,1,2} + triangle {10,11,12} + bridge 2-10; the
    // deterministic min-tie sweep traced by hand gives {0,1,2}->0 and
    // {10,11,12}->2 after 4 synchronous rounds (label 2 rides the
    // bridge into the right clique and wins as its smallest import)
    val fwd = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val edges = fwd ++ fwd.map(_.swap)
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 2L, 11L -> 2L, 12L -> 2L))
  }

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    GraphOps.triangleCounts(edges.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("K4 plus a pendant: per-node triangle and wedge counts") {
    // complete graph on {0,1,2,3} (4 triangles, each node in 3 of
    // them) plus pendant 4 -- 3 (node 4 in none, node 3's degree rises
    // to 4). Canonical u < v edges.
    val k4 = for (u <- 0L to 3L; v <- (u + 1) to 3L) yield (u, v)
    val t = triangles(k4 :+ (3L, 4L))
    assert(t(0L) === ((3L, 3L)) && t(1L) === ((3L, 3L)) && t(2L) === ((3L, 3L)))
    assert(t(3L) === ((3L, 6L)), "deg-4 node: 3 triangles, C(4,2)=6 wedges")
    assert(t(4L) === ((0L, 0L)), "pendant participates in nothing")
  }

  test("triangle-free bipartite graph counts zero everywhere") {
    val edges = for (u <- 0L to 2L; v <- 10L to 12L) yield (u, v)
    val t = triangles(edges)
    assert(t.size === 6 && t.values.forall(_._1 === 0L))
    // K(3,3): every node has degree 3 -> 3 wedges
    assert(t.values.forall(_._2 === 3L))
  }

  test("triangle plans stay cartesian-free (degree orientation joins)") {
    val k4 = for (u <- 0L to 3L; v <- (u + 1) to 3L) yield (u, v)
    val plan = GraphOps.triangleCounts(k4.toDF("u", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"triangle pipeline must be pure equi-joins:\n$plan")
  }

  private def bfs(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    GraphOps.bfsHops(edges.toDF("src", "dst"),
      sources.toDF("id"), maxHops).as[(Long, Int)].collect().toMap

  test("BFS hops: planted path graph, hop cap, unreachable absent") {
    // path 1-2-3-4-5 (both directions) plus island 9-10
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    val edges = fwd ++ fwd.map(_.swap)
    assert(bfs(edges, Seq(1L), 6) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // hop cap truncates the far end of the chain
    assert(bfs(edges, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    // min-hop under multiple sources; island reached from its own seed
    assert(bfs(edges, Seq(1L, 5L, 9L), 6) ===
      Map(1L -> 0, 5L -> 0, 9L -> 0,
        2L -> 1, 4L -> 1, 10L -> 1, 3L -> 2))
  }

  test("BFS hops: directed edges are not traversed backwards") {
    // directed chain 1 -> 2 -> 3; from 3 nothing is reachable
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(bfs(edges, Seq(3L), 4) === Map(3L -> 0))
    assert(bfs(edges, Seq(1L), 4) === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }
}
