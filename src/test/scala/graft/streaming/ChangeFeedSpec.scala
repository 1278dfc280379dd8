package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.TestSpark

/** The change-feed MicroBatchStream: commit-version offsets, exact
  * changelog rows, exactly-once across checkpoint restarts, and
  * downstream rollup maintenance that stays correct under UPDATE /
  * DELETE / rollback -- the cases the append-stream source documents
  * as out of contract. */
class ChangeFeedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("change feed streams the exact changelog exactly once across restarts (upsert, delete, rollback)") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cf-store"))
    vs.commitFull(Seq((1L, "g1", 10L), (2L, "g2", 20L)).toDF("k", "grp", "v"),
      "t", Nil)
    val v1 = vs.currentVersion("t")
    val ckpt = tmp("graft-cf-ckpt")
    val out = tmp("graft-cf-out")
    def drain(): Unit = {
      val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"),
        includePre = true)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def delivered(): Seq[(Long, String, String, Long, Option[String], Option[Long])] =
      spark.read.parquet(out)
        .select(col("k"), col("change_type"), col("grp"), col("v"),
          col("pre_grp"), col("pre_v"))
        .as[(Long, String, String, Long, Option[String], Option[Long])]
        .collect().sorted.toSeq

    // trigger 1: the startingVersion=earliest base -- the full v1
    // snapshot as inserts with null pre-images
    drain()
    assert(delivered() === Seq(
      (1L, "insert", "g1", 10L, None, None),
      (2L, "insert", "g2", 20L, None, None)))

    // two commits between triggers: an UPDATE and a DELETE -- the
    // next batch carries their NET changelog with pre-images
    vs.updateWhere("t", col("k") === 2L, Map("v" -> lit(25L)), Nil)
    vs.deleteWhere("t", col("k") === 1L, Nil)
    drain()
    assert(delivered() === Seq(
      (1L, "delete", "g1", 10L, Some("g1"), Some(10L)),
      (1L, "insert", "g1", 10L, None, None),
      (2L, "insert", "g2", 20L, None, None),
      (2L, "update", "g2", 25L, Some("g2"), Some(20L))))

    // quiet table: a restart from the same checkpoint re-delivers
    // NOTHING (exactly-once across restarts)
    drain()
    assert(delivered().size === 4)

    // rollback commits stream as the INVERSE changelog: k=1
    // reappears as an insert, k=2 updates back to its v1 value
    vs.rollbackTo("t", v1)
    drain()
    val afterRollback = delivered()
    assert(afterRollback.size === 6)
    assert(afterRollback.contains((1L, "insert", "g1", 10L, None, None)))
    assert(afterRollback.contains(
      (2L, "update", "g2", 20L, Some("g2"), Some(25L))))
    spark.streams.active.foreach(_.stop())
  }

  test("WAP snapshots are invisible to the feed; a publish streams as one commit across the version gap") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cf-wap"))
    vs.commitFull(Seq((1L, "a", 10L)).toDF("k", "grp", "v"), "t", Nil)
    val ckpt = tmp("graft-cf-wap-ckpt")
    val out = tmp("graft-cf-wap-out")
    def drain(): Unit = {
      val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 1)
    // a staged snapshot lands (version 2, never published-visible):
    // the feed sees NOTHING
    vs.stageFull(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "grp", "v"),
      "t", "wapfeed")
    drain()
    assert(spark.read.parquet(out).count() === 1)
    // publish: the head jumps over the burned staged version (1 -> 3);
    // the feed delivers exactly the published delta across the gap
    val pv = vs.publishStaged("t", "wapfeed")
    assert(pv === 3L) // version 2 burned by the staged snapshot
    drain()
    val got = spark.read.parquet(out)
      .select(col("k"), col("change_type"), col("v"))
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, "insert", 10L), (2L, "insert", 20L)))
    spark.streams.active.foreach(_.stop())
  }

  test("startingVersion=latest skips history; phantom staged files never reach the feed") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cf2-store"))
    vs.commitFull(Seq((1L, 5L, "b0")).toDF("k", "v", "b"), "t", Seq("b"))
    // a failed commit's orphan: stage a bare parquet file under _data
    // that NO manifest references -- the append stream would list it;
    // the change feed must not see it
    val orphanDir = s"${vs.path("t")}/_data/orphan-staged"
    Seq((99L, 99L)).toDF("k", "v").write.parquet(orphanDir)
    val ckpt = tmp("graft-cf2-ckpt")
    val out = tmp("graft-cf2-out")
    def drain(): Unit = {
      val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"),
        startingVersion = "latest")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // latest: the existing snapshot is NOT re-delivered
    def rows(): Seq[(Long, String, Long)] =
      spark.read.parquet(out).select(col("k"), col("change_type"), col("v"))
        .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rows().isEmpty)
    vs.commitPartitions(Seq((2L, 7L, "b1")).toDF("k", "v", "b"), "t", Seq("b"))
    drain()
    // only the committed append arrives; the orphan row never does
    assert(rows() === Seq((2L, "insert", 7L)))
    spark.streams.active.foreach(_.stop())
  }

  test("maxVersionsPerTrigger=1 yields per-commit granularity instead of net collapse") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cf3-store"))
    vs.commitFull(Seq((1L, 10L)).toDF("k", "v"), "t", Nil)
    vs.updateWhere("t", col("k") === 1L, Map("v" -> lit(20L)), Nil)
    vs.updateWhere("t", col("k") === 1L, Map("v" -> lit(30L)), Nil)
    val ckpt = tmp("graft-cf3-ckpt")
    val out = tmp("graft-cf3-out")
    val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"),
      includePre = true, maxVersionsPerTrigger = Some(1))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the net-collapsed feed would deliver ONE insert of v=30; the
    // capped feed walks the commits: insert 10, update 20, update 30
    val rows = spark.read.parquet(out)
      .select(col("change_type"), col("v"), col("pre_v"))
      .as[(String, Long, Option[Long])].collect().sortBy(_._2).toSeq
    assert(rows === Seq(
      ("insert", 10L, None),
      ("update", 20L, Some(10L)),
      ("update", 30L, Some(20L))))
    spark.streams.active.foreach(_.stop())
  }

  test("followIvfIndex maintains the persistent ANN index through the change feed") {
    import graft.api.Similarity
    import graft.ops.SimilarityOps
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfivf-store"))
    // three well-separated axes so cell assignment is unambiguous
    def vec(axis: Int, mag: Double): Array[Double] = {
      val a = Array.fill(4)(0.01); a(axis) = mag; a
    }
    val base = Seq(
      (1L, vec(0, 1.0), 0L), (2L, vec(0, 2.0), 0L),
      (3L, vec(1, 1.0), 1L), (4L, vec(1, 2.0), 1L),
      (5L, vec(2, 1.0), 2L), (6L, vec(2, 2.0), 2L))
      .toDF("vec_id", "embedding", "cell0")
    vs.commitFull(base, "src", Nil)
    Similarity.buildIvfIndex(vs, "idx", vs.read("src"),
      col("vec_id"), col("embedding"), col("cell0"))
    val ckpt = tmp("graft-cfivf-ckpt")
    def drain(): Unit = StreamingIngest.followIvfIndex(
      spark, vs, "src", "idx", pk = "vec_id", vecCol = "embedding",
      checkpoint = ckpt).awaitTermination()
    // the maintained index must always equal the from-scratch
    // assignment of the CURRENT source against the FIXED centroids
    def expected(): Set[(Long, Long)] = {
      val cur = vs.read("src").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", sqrt(SimilarityOps.dot(col("v"), col("v"))))
      SimilarityOps.assignToCentroids(cur, vs.read("idx_centroids"))
        .select("vec_id", "cell").as[(Long, Long)].collect().toSet
    }
    def indexed(): Set[(Long, Long)] =
      vs.read("idx_cells").select("vec_id", "cell")
        .as[(Long, Long)].collect().toSet

    drain() // earliest: the self-healing initial replay
    assert(indexed() === expected())

    // append a new vector near axis 1, MOVE vector 1 to axis 2's
    // neighborhood, and delete vector 4 -- then one drain
    graft.table.UpsertWriter.upsertAll(vs, "src",
      Seq((7L, vec(1, 3.0), -1L), (1L, vec(2, 5.0), -1L))
        .toDF("vec_id", "embedding", "cell0"), Seq("vec_id"))
    vs.deleteWhere("src", col("vec_id") === 4L, Nil)
    drain()
    assert(indexed() === expected())
    assert(indexed().contains((7L, 1L)), "new vector landed in cell 1")
    assert(indexed().contains((1L, 2L)), "moved vector re-homed to cell 2")
    assert(!indexed().exists(_._1 == 4L), "deleted vector evicted")
    // and the query path serves the maintained index: the new vector
    // is findable near its axis
    val q = Seq((100L, vec(1, 1.5))).toDF("qid", "qv")
    val hits = Similarity.queryIvfIndex(vs, "idx", q, col("qid"), col("qv"))
      .select("match_id").as[Long].collect().toSet
    assert(hits.contains(7L))
    // idempotent re-drain: nothing changes
    drain()
    assert(indexed() === expected())

    // emptying a whole cell: delete every remaining axis-0 vector --
    // the explicit-replacement commit must drop the partition, not
    // leave the stale cell alive (the plain-delta gap)
    vs.deleteWhere("src", col("vec_id") === 2L, Nil)
    drain()
    assert(indexed() === expected())
    assert(!indexed().exists(_._2 == 0L), "cell 0 must vanish when emptied")
    spark.streams.active.foreach(_.stop())
  }

  test("schema evolution mid-stream: added columns invisible, removed columns read null") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfse-store"))
    vs.commitFull(Seq((1L, "a", 10L)).toDF("k", "s", "v"), "t", Nil)
    val ckpt = tmp("graft-cfse-ckpt")
    val out = tmp("graft-cfse-out")
    // ONE stream definition: the schema pins at definition time and
    // every drain reuses it (a re-created stream would re-infer)
    val feed = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"))
    def drain(): Unit = {
      val q = feed.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // the (k, change_type, s, v) schema is now flowing
    // evolve: drop s, add w -- the evolved table replaces wholesale
    vs.commitFull(Seq((1L, 10L, true), (2L, 20L, false)).toDF("k", "v", "w"),
      "t", Nil)
    drain()
    val rows = spark.read.parquet(out)
      .select(col("k"), col("change_type"), col("s"), col("v"))
      .as[(Long, String, Option[String], Long)].collect().sortBy(r => (r._1, r._2))
    // the stream schema never saw w; the removed s reads null for the
    // post-evolution changes and the feed kept flowing
    assert(rows.map(_._1).toSeq === Seq(1L, 1L, 2L))
    assert(rows.exists(r => r._1 == 2L && r._2 == "insert" && r._3.isEmpty))
    // resubscribing -- a FRESH stream definition over the same
    // checkpoint -- re-infers the evolved schema: the added column
    // appears from here on (the other half of the pinned-schema
    // contract)
    vs.updateWhere("t", col("k") === 2L, Map("w" -> lit(true)), Nil)
    // foreachBatch sink: it recovers from the existing checkpoint
    // (memory/file sinks refuse or mis-number mid-checkpoint restarts)
    val evolvedCols = scala.collection.mutable.ArrayBuffer.empty[String]
    val evolvedRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Boolean)]
    StreamingIngest.changeFeed(spark, vs, "t", Seq("k"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        evolvedRows.synchronized {
          evolvedCols ++= batch.columns
          evolvedRows ++= batch
            .filter(col("change_type") === "update")
            .select(col("k"), col("change_type"), col("w"))
            .as[(Long, String, Boolean)].collect()
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(evolvedCols.contains("w"), "added column visible after resubscribe")
    assert(evolvedRows.toSeq === Seq((2L, "update", true)))
    spark.streams.active.foreach(_.stop())
  }

  test("followDedupRetractions: takedowns evict signatures; text updates re-sign") {
    import graft.api.Dedup
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfded-store"))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow"))
      .toDF("doc_id", "text")
    vs.commitFull(docs, "corpus", Nil)
    // index built batch-partitioned through the real admission path
    Dedup.ingestDeduped(vs, "sigs", vs.read("corpus"),
      col("doc_id"), col("text"), batchId = Some("b0"))
    assert(vs.read("sigs").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    val ckpt = tmp("graft-cfded-ckpt")
    def drain(): Unit = StreamingIngest.followDedupRetractions(
      spark, vs, "corpus", "sigs", pk = "doc_id", textCol = "text",
      checkpoint = ckpt).awaitTermination()
    // establish the checkpoint BEFORE takedowns: the first batch is a
    // net snapshot (inserts only -- ignored), and from here on every
    // delete/update reaches the follower
    drain()
    assert(vs.read("sigs").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L), "insert replay must not touch the index")

    // takedown doc 2, rewrite doc 3's text
    val newText = "a wholly different third document about sailing ships"
    vs.deleteWhere("corpus", col("doc_id") === 2L, Nil)
    vs.updateWhere("corpus", col("doc_id") === 3L,
      Map("text" -> lit(newText)), Nil)
    drain()
    val sigs = vs.read("sigs")
    assert(sigs.select("doc_id").as[Long].collect().toSet === Set(1L, 3L),
      "doc 2's signatures must be evicted")
    val expectedTh = docs.sparkSession.range(1)
      .select(graft.ops.DedupOps.hashedTokenSet(lit(newText)).as("th"))
      .as[Seq[Long]].head().toSet
    val storedTh = sigs.filter(col("doc_id") === 3L)
      .select("th").as[Seq[Long]].head().toSet
    assert(storedTh === expectedTh, "doc 3 must carry its re-derived signature")
    // idempotent re-drain
    drain()
    assert(vs.read("sigs").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 3L))
    spark.streams.active.foreach(_.stop())
  }

  test("followPhashRetractions: takedowns evict image hashes; payload updates re-hash through the codec") {
    import graft.api.Dedup
    import graft.ops.PixelCodec
    def png(group: String): Array[Byte] = PixelCodec.encodePng(
      PixelCodec.Image(9, 8, 1, Array.tabulate(72)(i =>
        (graft.ops.Hashing.h15Local(s"cfimg:$group:$i") % 256L).toByte)))
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfimg-store"))
    vs.commitFull(Seq((1L, png("a")), (2L, png("b")), (3L, png("c")))
      .toDF("doc_id", "bytes"), "assets", Nil)
    Dedup.ingestImagesDeduped(vs, "phash", vs.read("assets"),
      col("doc_id"), col("bytes"), batchId = Some("b0"))
    assert(vs.read("phash").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    val ckpt = tmp("graft-cfimg-ckpt")
    def drain(): Unit = StreamingIngest.followPhashRetractions(
      spark, vs, "assets", "phash", pk = "doc_id", payloadCol = "bytes",
      checkpoint = ckpt).awaitTermination()
    drain() // checkpoint BEFORE takedowns (net-snapshot contract)
    assert(vs.read("phash").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L), "insert replay must not touch the index")

    // takedown doc 2; replace doc 3's image bytes
    vs.deleteWhere("assets", col("doc_id") === 2L, Nil)
    vs.updateWhere("assets", col("doc_id") === 3L,
      Map("bytes" -> lit(png("c-replaced"))), Nil)
    drain()
    val idx = vs.read("phash")
    assert(idx.select("doc_id").as[Long].collect().toSet === Set(1L, 3L),
      "doc 2's hash must be evicted")
    // doc 3 must carry the hash of the NEW pixels: the general path
    // (gray + 9x8 resize) is the identity here, so dHash directly
    val img = PixelCodec.decodePng(png("c-replaced")).get
    val (elo, ehi) = PixelCodec.dHash(img)
    val row = idx.filter(col("doc_id") === 3L)
      .select("dhash_lo", "dhash_hi").as[(Long, Long)].head()
    assert(row === ((elo, ehi)), "doc 3 must carry its re-derived hash")
    // idempotent re-drain
    drain()
    assert(vs.read("phash").select("doc_id").as[Long].collect().toSet ===
      Set(1L, 3L))
    spark.streams.active.foreach(_.stop())
  }

  test("followRollupChanges maintains exact totals under update/delete/group-move/rollback") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfr-store"))
    vs.commitFull(
      Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L))
        .toDF("k", "grp", "v"),
      "src", Nil)
    val ckpt = tmp("graft-cfr-ckpt")
    def drain(): Unit = StreamingIngest.followRollupChanges(
      spark, vs, "src", "roll", pk = Seq("k"), groupKeys = Seq("grp"),
      sumCol = "v", checkpoint = ckpt).awaitTermination()
    // groups whose rows have all churned away fold to an n=0 partial
    // pair -- the "no rows" representation in an additive rollup
    def rollup(): Map[String, (Long, Long)] =
      StreamingIngest.readRollup(vs, "roll", Seq("grp"), "v")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
        .toMap.filter(_._2._1 != 0L)
    def expected(): Map[String, (Long, Long)] =
      vs.read("src").groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    drain()
    assert(rollup() === expected())
    val v1 = vs.currentVersion("src")

    // value update within a group
    vs.updateWhere("src", col("k") === 1L, Map("v" -> lit(15L)), Nil)
    // delete one row
    vs.deleteWhere("src", col("k") === 3L, Nil)
    drain()
    assert(rollup() === expected())

    // a row MOVES between groups: -1 in g1, +1 in g3
    vs.updateWhere("src", col("k") === 2L, Map("grp" -> lit("g3")), Nil)
    drain()
    assert(rollup() === expected())
    assert(rollup().keySet.contains("g3"))

    // rollback: the inverse changelog folds the rollup back too
    vs.rollbackTo("src", v1)
    drain()
    assert(rollup() === expected())
    spark.streams.active.foreach(_.stop())
  }

  test("followRollupChanges fails loud on a NULL sum column instead of drifting") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfrn-store"))
    vs.commitFull(
      Seq((1L, "g1", Some(10L)), (2L, "g1", None))
        .toDF("k", "grp", "v"), "src", Nil)
    val q = StreamingIngest.followRollupChanges(
      spark, vs, "src", "roll", pk = Seq("k"), groupKeys = Seq("grp"),
      sumCol = "v", checkpoint = tmp("graft-cfrn-ckpt"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    // a NULL delta silently dropping from sum() is the drift hazard;
    // the follower must instead kill the batch naming the column
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(msgs(e).exists(_.contains("followRollupChanges: NULL v")),
      s"expected the loud NULL error, got: ${msgs(e)}")
    spark.streams.active.foreach(_.stop())
  }

  test("followIvfIndex locateByIndex evicts stale rows a foreign placement hides") {
    import graft.api.Similarity
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfivf2-store"))
    def vec(axis: Int, mag: Double): Array[Double] = {
      val a = Array.fill(4)(0.01); a(axis) = mag; a
    }
    vs.commitFull(Seq(
      (1L, vec(0, 1.0), 0L), (2L, vec(0, 2.0), 0L),
      (3L, vec(1, 1.0), 1L), (4L, vec(1, 2.0), 1L))
      .toDF("vec_id", "embedding", "cell0"), "src", Nil)
    Similarity.buildIvfIndex(vs, "idx", vs.read("src"),
      col("vec_id"), col("embedding"), col("cell0"))
    // forge a FOREIGN index: vec 1 stored in cell 1 though the
    // centroids' argmax says cell 0 -- the placement the default
    // old-home derivation cannot see
    vs.commitFull(
      vs.read("idx_cells").withColumn("cell",
        when(col("vec_id") === 1L, lit(1L)).otherwise(col("cell"))),
      "idx_cells", Seq("cell"))
    val v0 = vs.currentVersion("src")
    vs.deleteWhere("src", col("vec_id") === 1L, Nil)
    def stale(): Long =
      vs.read("idx_cells").filter(col("vec_id") === 1L).count()
    // incremental-only adoption (explicit startingVersion skips the
    // self-healing earliest replay): the default centroid
    // re-assignment looks in cell 0 and the ghost in cell 1 survives
    // -- the documented precondition violation
    StreamingIngest.followIvfIndex(spark, vs, "src", "idx",
      pk = "vec_id", vecCol = "embedding",
      checkpoint = tmp("graft-cfivf2-ckptA"),
      startingVersion = v0.toString).awaitTermination()
    assert(stale() === 1L, "default path leaves the foreign-placed ghost")
    // locateByIndex asks the index itself where the key lives: the
    // same delete, replayed under a fresh checkpoint, evicts it
    StreamingIngest.followIvfIndex(spark, vs, "src", "idx",
      pk = "vec_id", vecCol = "embedding",
      checkpoint = tmp("graft-cfivf2-ckptB"),
      startingVersion = v0.toString,
      locateByIndex = true).awaitTermination()
    assert(stale() === 0L, "locateByIndex must evict the ghost")
    // the untouched cells survive the rewrite
    assert(vs.read("idx_cells").select("vec_id")
      .as[Long].collect().toSet === Set(2L, 3L, 4L))
    spark.streams.active.foreach(_.stop())
  }

  test("branch feed fails loudly when branch retention burned its replay base") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfbrexp"))
    vs.commitFull(Seq((1L, 10L)).toDF("k", "v"), "t", Nil)
    vs.createBranch("t", "dev")
    val ckpt = tmp("graft-cfbrexp-ckpt")
    val out = tmp("graft-cfbrexp-out")
    def drain(): Unit = {
      val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"),
        branch = Some("dev"), maxVersionsPerTrigger = Some(1))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    vs.commitFull(Seq((1L, 11L)).toDF("k", "v"), "t", Nil, branch = "dev")
    drain() // offset now sits at this branch commit
    // two MORE commits, then retention burns everything between the
    // base and the new head -- INCLUDING the checkpointed offset. The
    // next diff's base manifest is gone -> the retention contract
    // says fail loudly, never silently skip changes
    (2 to 3).foreach(i =>
      vs.commitFull(Seq((1L, 10L + i)).toDF("k", "v"), "t", Nil,
        branch = "dev"))
    vs.expireBranchSnapshots("t", "dev", keep = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("no live snapshot") ||
      m.contains("NoSuchElement")), s"unexpected failure: ${msgs(e)}")
    spark.streams.active.foreach(_.stop())
  }

  test("branch feed follows the branch lineage; main commits are invisible to it") {
    val vs = new graft.table.VersionedTableStore(spark, tmp("graft-cfbr"))
    vs.commitFull(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "t", Nil)
    vs.createBranch("t", "dev")
    val ckpt = tmp("graft-cfbr-ckpt")
    val out = tmp("graft-cfbr-out")
    def drain(): Unit = {
      val q = StreamingIngest.changeFeed(spark, vs, "t", Seq("k"),
        branch = Some("dev"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def delivered(): Seq[(Long, String, Long)] =
      spark.read.parquet(out).select(col("k"), col("change_type"), col("v"))
        .as[(Long, String, Long)].collect().sorted.toSeq
    // first batch: the branch state (= fork copy) as inserts
    drain()
    assert(delivered() === Seq((1L, "insert", 10L), (2L, "insert", 20L)))
    // a branch commit streams; an interleaved MAIN commit does not
    vs.commitFull(Seq((1L, 10L), (2L, 21L)).toDF("k", "v"), "t", Nil,
      branch = "dev")
    vs.commitFull(Seq((9L, 99L)).toDF("k", "v"), "t", Nil) // main only
    drain()
    assert(delivered() === Seq(
      (1L, "insert", 10L), (2L, "insert", 20L), (2L, "update", 21L)))
    // quiet branch: nothing re-delivered
    drain()
    assert(delivered().size === 3)
    spark.streams.active.foreach(_.stop())
  }
}
