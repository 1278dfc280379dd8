package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables
import graft.ops.DedupOps

/** The DataFrame-first API must produce exactly the results of the
  * table-bound query functions when pointed at the same data with
  * different column names. */
class DedupApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def renamedDocs =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("my_id"), col("text").as("body"), col("lang"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("minhashPairs matches dedupMinhashLsh on renamed columns") {
    val api = Dedup.minhashPairs(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupMinhashLsh(spark, dir)))
  }

  test("shinglePairs matches dedupNgramJaccard") {
    val api = Dedup.shinglePairs(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupNgramJaccard(spark, dir)))
  }

  test("simhashPairs with a lang block matches dedupSimhash") {
    val api = Dedup.simhashPairs(renamedDocs, col("my_id"), col("body"), Seq("lang"))
    assert(rows(api) === rows(DedupOps.dedupSimhash(spark, dir)))
  }

  test("clusters matches dedupClusters") {
    val api = Dedup.clusters(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupClusters(spark, dir)))
  }

  test("exactGroups matches dedupExact") {
    val api = Dedup.exactGroups(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupExact(spark, dir)))
  }

  test("hashSample is deterministic and repartition-stable") {
    val a = Dedup.hashSample(renamedDocs, col("my_id"), 0.1)
      .select("my_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Dedup.hashSample(renamedDocs.repartition(7), col("my_id"), 0.1)
      .select("my_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
