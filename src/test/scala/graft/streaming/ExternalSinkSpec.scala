package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.TestSpark

/** Change feed -> EXTERNAL sinks, exactly-once: the mirror into a
  * second, independent store and the batch-id-keyed JSONL export,
  * each driven through a planted mid-batch crash (side effect
  * durable, checkpoint offset not -- the at-least-once window) and
  * shown to converge to the clean run's state after restart. This is
  * the composition a real CDC consumer builds first; the internal
  * MERGE sink's crash spec (StreamingIngestSpec) does not cover
  * effects landing OUTSIDE the source store. */
class ExternalSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Source store with a history of inserts, updates (incl. a
    * group-move), and deletes across several commits. */
  private def seededSource(): (graft.table.VersionedTableStore, String) = {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-ext-src"))
    vs.commitFull(
      (1L to 8L).map(k => (k, s"g${k % 3}", k * 10L)).toDF("k", "grp", "v"),
      "t", Nil)
    vs.updateWhere("t", col("k") === 3L,
      Map("v" -> lit(999L), "grp" -> lit("g9")), Nil)
    vs.deleteWhere("t", col("k") === 5L, Nil)
    vs.commitFull(vs.read("t").unionByName(
      Seq((9L, "g0", 90L), (10L, "g1", 100L)).toDF("k", "grp", "v")), "t", Nil)
    vs.deleteWhere("t", col("k") === 1L, Nil)
    (vs, "t")
  }

  private def stateOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
    df.select(col("k"), col("grp"), col("v"))
      .as[(Long, String, Long)].collect().sorted.toSeq

  test("mirror into an independent store equals the source table") {
    val (vs, t) = seededSource()
    val dst = new graft.table.VersionedTableStore(spark, tmp("graft-ext-dst"))
    // ONE checkpoint for the mirror's lifetime (the follower
    // contract: a fresh checkpoint's first batch is a net snapshot
    // carrying no tombstones for pre-stream deletes)
    val ckpt = tmp("graft-ext-ckpt")
    StreamingIngest.followMirror(spark, vs, t, Seq("k"), dst, "m",
      ckpt, buckets = 4).awaitTermination()
    assert(stateOf(dst.read("m")) === stateOf(vs.read(t)))
    assert(stateOf(dst.read("m")).nonEmpty)
    // mirror keeps tracking: more churn, another drain, still equal
    vs.updateWhere(t, col("k") === 7L, Map("v" -> lit(-7L)), Nil)
    vs.deleteWhere(t, col("k") === 9L, Nil)
    StreamingIngest.followMirror(spark, vs, t, Seq("k"), dst, "m",
      ckpt, buckets = 4).awaitTermination()
    assert(stateOf(dst.read("m")) === stateOf(vs.read(t)))
    // bucket-granular maintenance: the second drain's commit touched
    // only the buckets holding k=7 and k=9, not all four
    assert(dst.partitionColumns("m") === Seq("__bucket"))
  }

  test("mirror: mid-batch crash after the external commit converges on restart") {
    val (vs, t) = seededSource()
    // clean reference run, per-commit batches
    val clean = new graft.table.VersionedTableStore(spark, tmp("graft-ext-clean"))
    StreamingIngest.followMirror(spark, vs, t, Seq("k"), clean, "m",
      tmp("graft-ext-ckpt-clean"), buckets = 4,
      maxVersionsPerTrigger = Some(1)).awaitTermination()
    val want = stateOf(clean.read("m"))
    assert(want === stateOf(vs.read(t)))

    // crash AFTER batch 1's mirror commit but before the offset
    // checkpoints -- the at-least-once window where the external
    // effect is durable but the progress record is not
    val dst = new graft.table.VersionedTableStore(spark, tmp("graft-ext-dst2"))
    val ckpt = tmp("graft-ext-ckpt3")
    val crashing = StreamingIngest.followMirror(spark, vs, t, Seq("k"), dst,
      "m", ckpt, buckets = 4, crashAfterBatch = Some(1L),
      maxVersionsPerTrigger = Some(1))
    intercept[StreamingQueryException] { crashing.awaitTermination() }
    val mid = stateOf(dst.read("m"))
    assert(mid.nonEmpty && mid != want,
      s"crash should leave a partially-applied mirror, got final state")

    // restart from the SAME checkpoint, fault removed: batch 1
    // replays against its own durable effect (idempotent rebuild),
    // the remaining commits apply, and the mirror equals the clean run
    StreamingIngest.followMirror(spark, vs, t, Seq("k"), dst, "m", ckpt,
      buckets = 4, maxVersionsPerTrigger = Some(1)).awaitTermination()
    assert(stateOf(dst.read("m")) === want)
    spark.streams.active.foreach(_.stop())
  }

  test("jsonl export: batch-id-keyed dirs are exactly-once across a crash") {
    val (vs, t) = seededSource()
    val out = tmp("graft-ext-jsonl")
    val ckpt = tmp("graft-ext-jckpt")
    val crashing = StreamingIngest.followChangesToJsonl(spark, vs, t,
      Seq("k"), out, ckpt, crashAfterBatch = Some(1L),
      maxVersionsPerTrigger = Some(1))
    intercept[StreamingQueryException] { crashing.awaitTermination() }
    // batch 1's dir is durable (that is the fault window)
    assert(new java.io.File(s"$out/batch=1/_SUCCESS").exists())

    // restart: batch 1 REWRITES its own dir (no duplicate rows), the
    // rest follow
    StreamingIngest.followChangesToJsonl(spark, vs, t, Seq("k"), out, ckpt,
      maxVersionsPerTrigger = Some(1)).awaitTermination()

    // the union of all batch dirs, applied in batch order with
    // last-change-wins per key, reconstructs the table exactly --
    // the external consumer's contract
    val log = spark.read.json(s"$out/batch=*")
      .withColumn("batch",
        regexp_extract(col("_metadata").getField("file_path"),
          "/batch=(\\d+)/", 1).cast("long"))
    val applied = log
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(col("batch").desc)))
      .filter(col("rn") === 1 && col("change_type") =!= "delete")
      .select(col("k"), col("grp"), col("v"))
    assert(stateOf(applied) === stateOf(vs.read(t)))

    // exactly-once at the row level: batch 1's dir holds ONE changelog
    // (the replay overwrote, not appended)
    val b1 = spark.read.json(s"$out/batch=1")
    assert(b1.groupBy(col("k"), col("change_type")).count()
      .filter(col("count") > 1).isEmpty)
    spark.streams.active.foreach(_.stop())
  }
}
