package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** Planted-data behavior for the real pixel/audio path -- properties
  * derived from the CONSTRUCTION, not from engine-vs-oracle equality
  * (which PixelCodecSpec + the driver gate cover):
  *
  * dedup_image_phash synthesis gives docs sharing `doc_id / 10` (a
  * fixed-size span, so duplicate density is scale-invariant) the
  * same base 9x8 image, nudged by +1 on the first `doc_id % 4`
  * pixels. On paper: the nudge touches pixels 0..2 at most, which
  * touch dHash comparisons x in {0, 1, 2} of row 0 only -- so two
  * same-group hashes differ in at most 3 of 64 bits (bits 0..2), all
  * inside band 0, leaving bands 1..3 identical. Therefore EVERY
  * same-group pair is a guaranteed LSH candidate AND passes the
  * Hamming gate; any cross-group pair in the output would mean two
  * independent pixel mixes landed within 10/64 bits -- loud-fail it.
  */
class MultimodalPixelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup_image_phash returns exactly the same-group pairs, within the paper Hamming bound") {
    val rows = MultimodalOps.imagePhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val span = MultimodalOps.NearDupSpan
    rows.foreach { case (a, b, ham) =>
      assert(a / span === b / span, s"cross-group pair ($a, $b) surfaced")
      assert(ham <= 3, s"pair ($a, $b) hamming $ham exceeds the paper bound")
      assert(a < b)
    }
    // completeness: every same-group doc pair is present
    val ids = graft.core.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      a <- ids; b <- ids if a < b && a / span == b / span
    } yield (a, b)).toSet
    assert(rows.map(t => (t._1, t._2)).toSet === expected)
    // identical-noise docs are exact duplicates: hamming 0
    rows.foreach { case (a, b, ham) =>
      if (a % 4 == b % 4) assert(ham === 0, s"($a, $b)")
    }
  }

  test("mm_pixel_decode sniffs the container from bytes per the doc_id % 4 construction") {
    val rows = MultimodalOps.pixelDecode(spark, dir).collect()
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(rows.length.toLong === nDocs) // no decode fell over
    rows.foreach { r =>
      val d = r.getLong(0)
      val (fmt, nch) = (r.getString(1), r.getInt(2))
      (d % 4) match {
        case 0 => assert(fmt === "bmp" && nch === 3, s"doc $d")
        case 1 => assert(fmt === "png" && nch === 1, s"doc $d")
        case 2 => assert(fmt === "png" && nch === 3, s"doc $d")
        case _ => assert(fmt === "gif" && nch === 1, s"doc $d")
      }
      assert(r.getInt(3) === 24 && r.getInt(4) === 18)
    }
    // all four containers actually present in the fixture
    assert(rows.map(_.getString(1)).toSet === Set("bmp", "png", "gif"))
  }

  test("mm_audio_decode recovers the constructed sample counts through the WAV container") {
    MultimodalOps.audioDecode(spark, dir).collect().foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === 800 + d % 400, s"doc $d")
      assert(r.getInt(4) <= 32768) // abs(-32768) when the mix hits 0
    }
  }

  test("mm_frame_decode samples every 2nd frame of the constructed APNG count") {
    val byDoc = MultimodalOps.frameDecode(spark, dir).collect()
      .groupBy(_.getLong(0))
    byDoc.foreach { case (d, rows) =>
      val n = (2 + d % 5).toInt
      assert(rows.forall(_.getInt(2) === n), s"doc $d")
      assert(rows.map(_.getInt(1)).sorted.toSeq ===
        (0 until n by 2).toSeq, s"doc $d") // even frames, all present
    }
  }

  test("ingestImagesDeduped: persistent phash index, whole-cluster drops, crash-retry idempotence") {
    import spark.implicits._
    // real PNG assets: same group string -> same base image; noise
    // nudges the first k pixels (Hamming <= 3 by the dHash argument
    // in the pair spec above); different groups are h15-independent
    def asset(id: Long, group: String, noise: Int): (Long, Array[Byte]) = {
      val px = Array.tabulate(72) { i =>
        ((graft.ops.Hashing.h15Local(s"spec-img:$group:$i") % 256L +
          (if (i < noise) 1 else 0)) % 256L).toByte
      }
      (id, PixelCodec.encodePng(PixelCodec.Image(9, 8, 1, px)))
    }
    val store = new graft.table.VersionedTableStore(spark,
      java.nio.file.Files.createTempDirectory("phash-ingest").toString)
    val b1 = Seq(asset(1, "g0", 0), asset(2, "g0", 1), asset(3, "g1", 0),
      asset(4, "g1", 1), asset(5, "g2", 0), asset(6, "g3", 0))
      .toDF("id", "bytes")
    val s1 = graft.api.Dedup.ingestImagesDeduped(store, "phash_idx", b1,
      col("id"), col("bytes"), batchId = Some("b1"))
      .collect().map(_.getLong(0)).toSet
    // within-batch clusters {1,2} {3,4} {5} {6}: min-id survives
    assert(s1 === Set(1L, 3L, 5L, 6L))
    assert(store.read("phash_idx").count() === 4)

    // batch 2: 11 near-dups corpus g0 -> dropped; 12 fresh; the
    // {13,14} cluster near-dups corpus g1 -> dropped WHOLE
    val b2 = Seq(asset(11, "g0", 2), asset(12, "g4", 0),
      asset(13, "g1", 3), asset(14, "g1", 2)).toDF("id", "bytes")
    val s2 = graft.api.Dedup.ingestImagesDeduped(store, "phash_idx", b2,
      col("id"), col("bytes"), batchId = Some("b2"))
      .collect().map(_.getLong(0)).toSet
    assert(s2 === Set(12L))
    assert(store.read("phash_idx").count() === 5)

    // crash-retry: the batch's own merged hash is already in the
    // index; the retry must NOT count it as a corpus hit
    val s2retry = graft.api.Dedup.ingestImagesDeduped(store, "phash_idx",
      b2, col("id"), col("bytes"), batchId = Some("b2"))
      .collect().map(_.getLong(0)).toSet
    assert(s2retry === Set(12L))
    assert(store.read("phash_idx").count() === 5)
    assert(store.read("phash_idx").select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L, 6L, 12L))
  }

  test("the banded pair plan is scale-clean") {
    graft.plans.PlanAudit.assertScales(
      MultimodalOps.imagePhashDedup(spark, dir))
  }

  test("spectrogram DFT: planted tone concentrates power in its own bin") {
    import MultimodalOps.{SpecFrame, SpecCosQ, frameSpectralSums}
    // two full frames of a bin-4 cosine, amplitude 1000 (sampled off
    // the quantized table itself, so the tone is exactly representable)
    val tone = Array.tabulate(2 * SpecFrame)(j =>
      (SpecCosQ((4 * j) % SpecFrame) / 1000).toShort)
    val sums = frameSpectralSums(7L, tone)
    assert(sums.size === 2 * MultimodalOps.SpecBins.size)
    def power(bin: Int): BigInt = sums.filter(_.bin == bin)
      .map(r => BigInt(r.re_q) * r.re_q + BigInt(r.im_q) * r.im_q).sum
    // the probed tone bin carries ~N/2 * A^2 * Q^2 per frame; every
    // other probed bin only picks up quantization crumbs
    assert(power(4) > power(1) * 100000L)
    assert(power(4) > power(2) * 100000L)
    assert(power(4) > power(8) * 100000L)
    // a DC (constant) signal is invisible to every probed bin: the
    // quantized basis still sums to ~zero over a full period
    val dc = Array.fill(SpecFrame)(500.toShort)
    val dcP = frameSpectralSums(1L, dc)
      .map(r => BigInt(r.re_q) * r.re_q + BigInt(r.im_q) * r.im_q).max
    assert(dcP < power(4) / 100000L)
    // independent re-derivation of one frame/bin pair (fresh loop,
    // fresh indexing) matches the codec-loop values
    val r2 = sums.find(r => r.frame_idx == 1 && r.bin == 2).get
    var re = 0L; var im = 0L
    for (j <- 0 until SpecFrame) {
      val v = tone(SpecFrame + j).toLong
      re += v * SpecCosQ((2 * j) % SpecFrame)
      im -= v * MultimodalOps.SpecSinQ((2 * j) % SpecFrame)
    }
    assert((r2.re_q, r2.im_q) === ((re, im)))
  }
}
