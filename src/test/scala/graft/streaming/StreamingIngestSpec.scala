package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.TestSpark
import graft.core.Tables

/** Streaming vs batch parity over the driver's events table: the same
  * windowed aggregation must produce identical results through the
  * AvailableNow streaming path and the batch path. */
class StreamingIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("versioned table as a streaming source: appends arrive once, partitions recovered") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-tstream-store"))
    vs.commitFull(Seq((1L, "a", "d1"), (2L, "b", "d1")).toDF("k", "v", "day"),
      "ev", Seq("day"))
    val ckpt = tmp("graft-tstream-ckpt")
    val out = tmp("graft-tstream-out")
    val src = StreamingIngest.tableAppendStream(spark, vs, "ev")
    // output schema == the batch read's schema, partition col recovered
    assert(src.schema.fieldNames.toSeq === vs.read("ev").schema.fieldNames.toSeq)
    def drain(): Unit = {
      val q = StreamingIngest.tableAppendStream(spark, vs, "ev")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def delivered(): Seq[(Long, String, String)] =
      spark.read.parquet(out).select("k", "v", "day")
        .as[(Long, String, String)].collect().sorted.toSeq
    drain()
    assert(delivered() === Seq((1L, "a", "d1"), (2L, "b", "d1")))
    // an appended partition: the SAME checkpoint delivers ONLY the
    // new files to the next drain (exactly-once file accounting)
    vs.commitPartitions(Seq((3L, "c", "d2")).toDF("k", "v", "day"),
      "ev", Seq("day"))
    drain()
    assert(delivered() ===
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2")))
    // nothing new -> nothing re-delivered
    drain()
    assert(delivered() ===
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2")))
    spark.streams.active.foreach(_.stop())
  }

  test("followRollup maintains an additive rollup from the table's append stream") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-froll-store"))
    vs.commitFull(Seq((1L, "a", 10.0, "d1"), (2L, "b", 20.0, "d1"),
      (3L, "a", 5.0, "d1")).toDF("k", "grp", "px", "day"), "src", Seq("day"))
    val ckpt = tmp("graft-froll-ckpt")
    def drain(): Unit = StreamingIngest.followRollup(
      spark, vs, "src", "roll", Seq("grp"), "px", ckpt).awaitTermination()
    def state(): Map[String, (Long, Double)] =
      StreamingIngest.readRollup(vs, "roll", Seq("grp"), "px")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    drain()
    assert(state() === Map("a" -> ((2L, 15.0)), "b" -> ((1L, 20.0))))
    // day-2 appends fold in incrementally: only the new rows aggregate
    vs.commitPartitions(Seq((4L, "a", 1.0, "d2"), (5L, "c", 7.0, "d2"))
      .toDF("k", "grp", "px", "day"), "src", Seq("day"))
    drain()
    assert(state() === Map("a" -> ((3L, 16.0)), "b" -> ((1L, 20.0)),
      "c" -> ((1L, 7.0))))
    // matches the batch recompute over the source
    val batch = vs.read("src").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("px")).as("s"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state() === batch)
    // an empty drain commits nothing new
    val v = vs.currentVersion("roll")
    drain()
    assert(vs.currentVersion("roll") === v)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming exact dedup matches the batch survivor set") {
    import StreamingIngest.KeyedDoc
    val src = tmp("graft-dedup-src")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.ops.DedupOps.contentKey(col("text")).as("content_key"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src).as[KeyedDoc]
    val deduped = StreamingIngest.streamingExactDedup(stream)
    StreamingIngest.runAvailableNow(deduped.toDF(), "dedup_stream", "append",
      tmp("graft-dedup-ckpt"))
    val got = spark.table("dedup_stream")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expected = graft.ops.DedupOps.dedupExact(spark, sfDir)
      .select("survivor_id").as[Long].collect().sorted.toSeq
    assert(got === expected)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming quality gate + chunking matches the batch path") {
    val src = tmp("graft-qc-src")
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    StreamingIngest.runAvailableNow(
      StreamingIngest.qualityChunkStream(stream), "qc_stream", "append",
      tmp("graft-qc-ckpt"))
    val got = spark.table("qc_stream")
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().sorted.toSeq
    // batch path: gate survivors (keep = true) chunked the same way
    val survivors = graft.ops.TextOps.qualityGate(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    val expected = graft.ops.TextOps.chunkOf(
        Tables.documents(spark, sfDir).join(survivors, Seq("doc_id"), "left_semi"))
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(expected.nonEmpty && got === expected)
    spark.streams.active.foreach(_.stop())
  }

  test("foreachBatch upsert sink lands every event exactly once") {
    val src = tmp("graft-sink-src")
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    events.write.mode("overwrite").parquet(src)
    val store = new graft.table.TableStore(spark, tmp("graft-sink-wh"))
    // several micro-batches, each MERGEd on event_id
    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(1))
    StreamingIngest.upsertSink(stream, store, "events_merged", keys = Seq("event_id"),
      partitionBy = Nil, checkpoint = tmp("graft-sink-ckpt"), queryName = "sink")
    val got = store.read("events_merged").select("event_id").as[Long].collect().sorted.toSeq
    val expected = events.select("event_id").as[Long].collect().sorted.toSeq
    assert(got === expected)
    spark.streams.active.foreach(_.stop())
  }

  test("AvailableNow windowed aggregation matches batch result") {
    // micro-batch-friendly copy with a proper timestamp column
    val src = tmp("graft-stream-src")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(src)

    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(2))
    val agg = StreamingIngest.windowedCounts(stream, "ts", "1 day", "2 hours")
    StreamingIngest.runAvailableNow(agg, "win_counts", "append", tmp("graft-ckpt"))

    val got = spark.table("win_counts")
      .select("window_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    val expected = spark.read.parquet(src)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start"), col("event_type"), col("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    // append mode only emits windows closed by the watermark; every
    // emitted window must match the batch rollup exactly
    assert(got.nonEmpty)
    assert(got.subsetOf(expected))
    spark.streams.active.foreach(_.stop())
  }

  test("AvailableNow sliding windows match the batch sliding rollup") {
    val src = tmp("graft-stream-slide")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .write.mode("overwrite").parquet(src)

    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(2))
    val agg = StreamingIngest.slidingCounts(stream, "ts", "1 day", "6 hours", "2 hours")
    StreamingIngest.runAvailableNow(agg, "slide_counts", "append", tmp("graft-ckpt-sl"))

    val got = spark.table("slide_counts")
      .select("window_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val expected = spark.read.parquet(src)
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start"), col("event_type"), col("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    // every event contributes to window/slide = 4 overlapping windows;
    // append emits only watermark-closed ones, each exactly the batch value
    assert(got.nonEmpty)
    assert(got.subsetOf(expected))
    spark.streams.active.foreach(_.stop())
  }

  test("streaming session windows match the batch session aggregation") {
    val src = tmp("graft-stream-sess")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(src)
    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(2))
    StreamingIngest.runAvailableNow(
      StreamingIngest.sessionCounts(stream, "ts", "1 hour", "2 hours"),
      "sess_counts", "append", tmp("graft-ckpt-sess"))
    val got = spark.table("sess_counts")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val expected = StreamingIngest.sessionCounts(
      spark.read.parquet(src), "ts", "1 hour", "2 hours")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    // append emits watermark-closed sessions; each must equal its
    // batch twin exactly (same start, same count)
    assert(got.nonEmpty)
    assert(got.subsetOf(expected))
    spark.streams.active.foreach(_.stop())
  }

  test("watermark-bounded dedup drops every in-window duplicate (one survivor per key)") {
    val src = tmp("graft-stream-wmdedup")
    // events keyed by user: many duplicates per key, all within the
    // 30-day span; a 90-day watermark keeps every key in state for
    // the whole run, so exactly one row per user must survive
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(src)
    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(2))
    val dedup = StreamingIngest.streamingDedupWithinWatermark(
      stream, "user_id", "ts", "90 days")
    StreamingIngest.runAvailableNow(dedup, "wm_dedup", "append", tmp("graft-ckpt-wm"))
    val got = spark.table("wm_dedup").select("user_id").as[Long].collect()
    val users = spark.read.parquet(src).select("user_id").distinct().as[Long].collect()
    assert(got.length === users.length, "duplicate keys leaked through")
    assert(got.toSet === users.toSet)
  }

  test("stream-stream attribution join matches the batch interval join") {
    val src = tmp("graft-stream-attr")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(src)

    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"))

    val stream = StreamingIngest.readEventStream(spark, src, maxFilesPerTrigger = Some(2))
    val (sc, sp) = sides(stream)
    StreamingIngest.runAvailableNow(
      StreamingIngest.attributionJoin(sc, sp, "2 hours"),
      "attr_join", "append", tmp("graft-ckpt-attr"))
    val got = spark.table("attr_join")
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    val (bc, bp) = sides(spark.read.parquet(src))
    val expected = StreamingIngest.attributionJoin(bc, bp, "2 hours")
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    // inner stream-stream join in append mode emits exactly the
    // batch pair set once both watermarks pass (AvailableNow drains)
    assert(got.nonEmpty)
    assert(got === expected)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming quote-zone ingest sees new date partitions incrementally") {
    val root = tmp("graft-stream-zone")
    val jobsDate1 = "2026-02-09"
    graft.sources.JsonlQuoteSource.write(
      graft.sources.QuoteGenerator.quotes(spark, Seq("AAPL", "MSFT"), jobsDate1, "t1"),
      root, jobsDate1)
    val counts = StreamingIngest.readQuoteZone(spark, root)
      .groupBy(col("date")).agg(count(lit(1)).as("n"))
    val q = counts.writeStream.queryName("zone_counts").outputMode("complete")
      .format("memory").option("checkpointLocation", tmp("graft-zone-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("zone_counts").collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map(jobsDate1 -> 2L))
    // a second day lands; a fresh AvailableNow pass picks it up too
    graft.sources.JsonlQuoteSource.write(
      graft.sources.QuoteGenerator.quotes(spark, Seq("AAPL"), "2026-02-10", "t2"),
      root, "2026-02-10")
    val q2 = counts.writeStream.queryName("zone_counts2").outputMode("complete")
      .format("memory").option("checkpointLocation", tmp("graft-zone-ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("zone_counts2").collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map(jobsDate1 -> 2L, "2026-02-10" -> 1L))
  }

  test("corpus intake: mid-batch crash + checkpoint restart converges to the clean run") {
    import org.apache.spark.sql.streaming.StreamingQueryException
    val src = tmp("graft-intake-src")
    // four files -> four micro-batches under maxFilesPerTrigger=1
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .repartition(4).write.mode("overwrite").parquet(src)
    def docStream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    def chunksOf(store: graft.table.VersionedTableStore) =
      store.read("chunks").select("doc_id", "chunk_id", "chunk_hash")
        .as[(Long, Int, Long)].collect().sorted.toSeq

    // reference: one uninterrupted run
    val clean = new graft.table.VersionedTableStore(spark, tmp("graft-intake-clean"))
    StreamingIngest.corpusIntakeToWarehouse(docStream, clean, "chunks",
      tmp("graft-intake-ckpt-clean"), "intake_clean").awaitTermination()
    val cleanRows = chunksOf(clean)
    assert(cleanRows.nonEmpty)

    // crash AFTER batch 1's snapshot commit but before the batch
    // completes -- the at-least-once window where a side effect is
    // durable but the offset is not
    val wh = new graft.table.VersionedTableStore(spark, tmp("graft-intake-wh"))
    val ckpt = tmp("graft-intake-ckpt")
    val crashing = StreamingIngest.corpusIntakeToWarehouse(docStream, wh, "chunks",
      ckpt, "intake_crash", crashAfterBatch = Some(1L))
    intercept[StreamingQueryException] { crashing.awaitTermination() }
    val mid = wh.read("chunks").count()
    assert(mid > 0 && mid < cleanRows.size,
      s"crash should leave a partial table, got $mid of ${cleanRows.size}")

    // restart from the SAME checkpoint, fault removed: batch 1 replays
    // (MERGE no-op on chunk_hash), remaining batches run, final state
    // is row-identical to the clean run
    StreamingIngest.corpusIntakeToWarehouse(docStream, wh, "chunks",
      ckpt, "intake_resume").awaitTermination()
    assert(chunksOf(wh) === cleanRows)
    // the versioned history shows per-batch snapshot commits survived
    // the crash (rollback-able intake)
    assert(wh.versions("chunks").size >= 3)
    spark.streams.active.foreach(_.stop())
  }

  test("stateful latest-event-per-user matches the batch W1 dedup") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .as[StreamingIngest.EventRow]
    val got = StreamingIngest.latestEventPerUser(events)
      .collect().map { case (u, s) => (u, s.event_id) }.toMap

    val expected = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), struct(col("ts_us"), col("event_id"))).as("event_id"))
      .as[(Long, Long)].collect().toMap

    assert(got === expected)
  }

}
