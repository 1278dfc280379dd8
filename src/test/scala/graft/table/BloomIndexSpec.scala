package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition bloom index: point lookups on a non-partition key scan
  * only the partitions whose bloom might contain the value; a stale
  * index (any commit after the build) is silently ignored so rows can
  * never be dropped; results always equal the plain scan exactly. */
class BloomIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-bloom").toString)

  // 10 day-partitions, keys 1000*day .. 1000*day+99: every day's
  // key range is disjoint BUT the manifest only carries day stats,
  // so without the bloom a key lookup must scan all 10 partitions
  private def plant(vs: VersionedTableStore): Unit =
    vs.commitFull(
      (0 until 10).flatMap(day => (0 until 100).map(i =>
        (day * 1000L + i, s"v$day-$i", day))).toDF("k", "s", "day"),
      "t", partitionBy = Seq("day"))

  test("indexed point lookup prunes to the owning partition, results exact") {
    val vs = fresh()
    plant(vs)
    assert(vs.buildBloomIndex("t", "k") === 10)
    val hit = vs.readPointIndexed("t", "k", 3042L)
    assert(hit.select("s").as[String].collect().toSeq === Seq("v3-42"))
    // plan proof: only partitions the bloom admits are in the scan --
    // for a unique key that is (almost surely) exactly day=3
    val dirs = hit.inputFiles.map(_.split("/day=")(1).takeWhile(_ != '/')).toSet
    assert(dirs.contains("3") && dirs.size <= 2,
      s"bloom should prune to ~1 partition, scanned days $dirs")
    // exactness parity with the unindexed path, hit and miss
    assert(vs.readPointIndexed("t", "k", 3042L).collect().toSeq ===
      vs.readPoint("t", "k", 3042L).collect().toSeq)
    assert(vs.readPointIndexed("t", "k", 999999L).count() === 0)
  }

  test("a stale index is ignored: post-build commits stay visible") {
    val vs = fresh()
    plant(vs)
    vs.buildBloomIndex("t", "k")
    // new delta commit AFTER the build adds key 20042 in day=20
    vs.commitPartitions(Seq((20042L, "new", 20)).toDF("k", "s", "day"),
      "t", Seq("day"))
    // the index was built at the previous version: it must NOT be
    // consulted, or the new row would be wrongly pruned away
    assert(vs.readPointIndexed("t", "k", 20042L)
      .select("s").as[String].collect().toSeq === Seq("new"))
    // rebuild at the new head re-enables pruning, new row included
    assert(vs.buildBloomIndex("t", "k") === 11)
    assert(vs.readPointIndexed("t", "k", 20042L)
      .select("s").as[String].collect().toSeq === Seq("new"))
  }

  test("string keys and unpartitioned tables") {
    val vs = fresh()
    vs.commitFull(Seq((1L, "alpha"), (2L, "beta")).toDF("k", "s"), "u")
    assert(vs.buildBloomIndex("u", "s") === 1) // one "." rel
    assert(vs.readPointIndexedString("u", "s", "beta")
      .select("k").as[Long].collect().toSeq === Seq(2L))
    assert(vs.readPointIndexedString("u", "s", "gamma").count() === 0)
  }

  test("unsupported key types reject loudly") {
    val vs = fresh()
    vs.commitFull(Seq((1.5, "a")).toDF("x", "s"), "d")
    intercept[IllegalArgumentException] { vs.buildBloomIndex("d", "x") }
  }
}
