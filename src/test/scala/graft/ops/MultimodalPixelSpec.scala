package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-data behavior for the real pixel/audio path -- properties
  * derived from the CONSTRUCTION, not from engine-vs-oracle equality
  * (which PixelCodecSpec + the driver gate cover):
  *
  * dedup_image_phash synthesis gives docs sharing `doc_id % 200` the
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
    rows.foreach { case (a, b, ham) =>
      assert(a % 200 === b % 200, s"cross-group pair ($a, $b) surfaced")
      assert(ham <= 3, s"pair ($a, $b) hamming $ham exceeds the paper bound")
      assert(a < b)
    }
    // completeness: every same-group doc pair is present
    val ids = graft.core.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      a <- ids; b <- ids if a < b && a % 200 == b % 200
    } yield (a, b)).toSet
    assert(rows.map(t => (t._1, t._2)).toSet === expected)
    // identical-noise docs are exact duplicates: hamming 0
    rows.foreach { case (a, b, ham) =>
      if (a % 4 == b % 4) assert(ham === 0, s"($a, $b)")
    }
  }

  test("mm_pixel_decode sniffs the container from bytes per the doc_id % 3 construction") {
    val rows = MultimodalOps.pixelDecode(spark, dir).collect()
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(rows.length.toLong === nDocs) // no decode fell over
    rows.foreach { r =>
      val d = r.getLong(0)
      val (fmt, nch) = (r.getString(1), r.getInt(2))
      if (d % 3 == 0) assert(fmt === "bmp" && nch === 3, s"doc $d")
      else if (d % 3 == 1) assert(fmt === "png" && nch === 1, s"doc $d")
      else assert(fmt === "png" && nch === 3, s"doc $d")
      assert(r.getInt(3) === 24 && r.getInt(4) === 18)
    }
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

  test("the banded pair plan is scale-clean") {
    graft.plans.PlanAudit.assertScales(
      MultimodalOps.imagePhashDedup(spark, dir))
  }
}
