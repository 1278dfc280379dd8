package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.KmvSketch.kmv
import graft.ops.DiagnosticsOps

/** Paper-derived behavior of the KMV distinct-set sketch (Beyer et
  * al., SIGMOD'07): exactness below capacity, the saturation flag as
  * the information-loss witness, estimator accuracy ~ 1/sqrt(k)
  * above capacity, and the overlap op built on it. */
class KmvSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(vals: Seq[Long], k: Int): Row =
    vals.toDF("v").repartition(7) // force map-side partials + merges
      .agg(kmv(xxhash64(col("v")), k).as("sk"))
      .select(col("sk.mins"), col("sk.saturated"))
      .head()

  test("below capacity: holds every distinct hash, unsaturated, sorted") {
    val r = sketch(Seq(5L, 3L, 5L, 9L, 3L, 3L, 7L), k = 16)
    val mins = r.getSeq[Long](0)
    assert(!r.getBoolean(1))
    assert(mins.size === 4, "4 distinct inputs -> 4 stored hashes")
    assert(mins === mins.sorted, "flipped storage must be signed-ascending")
    assert(mins.distinct.size === mins.size)
  }

  test("saturation flips exactly at the k+1-th distinct value") {
    assert(!sketch((1L to 8L), k = 8).getBoolean(1))
    val over = sketch((1L to 9L), k = 8)
    assert(over.getBoolean(1))
    assert(over.getSeq[Long](0).size === 8, "capacity still bounds state")
  }

  test("saturated estimator: NDV within the 1/sqrt(k) error regime") {
    val k = 256
    val n = 10000
    val vals = new Random(42).shuffle((1L to n.toLong).toVector)
    val r = sketch(vals, k)
    assert(r.getBoolean(1))
    val mins = r.getSeq[Long](0)
    // (k-1) / u(k-th min) with the flipped -> [0,1) mapping
    val u = (mins.last.toDouble + 9.223372036854776e18) / 1.8446744073709552e19
    val est = (k - 1) / u
    assert(math.abs(est - n) < 0.25 * n,
      s"estimate $est vs true $n outside 4-sigma-ish band")
  }

  test("keyOverlap exact regime matches set arithmetic (incl. zero overlap)") {
    // side 1: {1..100}; side 2: {51..150} (overlap 50); side 3: {1000..1019}
    val rows = (1L to 100L).map(("s1", _)) ++
      (51L to 150L).map(("s2", _)) ++ (1000L to 1019L).map(("s3", _))
    val got = DiagnosticsOps.keyOverlap(
        rows.toDF("src", "key"), col("src"), col("key"), k = 1024)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("s1", "s2")) === ((100L, 100L, 50L)))
    assert(got(("s1", "s3")) === ((100L, 20L, 0L)))
    assert(got(("s2", "s3")) === ((100L, 20L, 0L)))
  }

  test("keyOverlap saturated regime: intersection estimate in band") {
    val n = 4000
    val rnd = new Random(7)
    // two sides sharing exactly half their keys
    val shared = (1L to (n / 2).toLong)
    val a = shared ++ ((100000L) until (100000L + n / 2))
    val b = shared ++ ((200000L) until (200000L + n / 2))
    val rows = rnd.shuffle(a.map(("a", _)) ++ b.map(("b", _)))
    val r = DiagnosticsOps.keyOverlap(
        rows.toDF("src", "key"), col("src"), col("key"), k = 512)
      .as[(String, String, Long, Long, Long)].head()
    assert(math.abs(r._3 - n) < 0.3 * n, s"n_a ${r._3} vs $n")
    assert(math.abs(r._4 - n) < 0.3 * n, s"n_b ${r._4} vs $n")
    assert(math.abs(r._5 - n / 2) < 0.4 * n / 2,
      s"n_common ${r._5} vs ${n / 2}")
  }
}
