package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition (SURVEY.md S7.6).
  *
  * The container has no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked deterministic fake; everything AROUND it -- the
  * binary column, the typed row schema, the per-partition batched
  * execution via `Dataset.mapPartitions`, the pruned input projection
  * -- is the real plumbing a decode stage needs. Swapping in a real
  * codec changes only the body of `decode`.
  *
  * Scale notes: `mapPartitions` keeps the decoder per-partition (one
  * codec init per task, not per row), the input is projected to
  * (doc_id, payload) before the typed boundary (column pruning still
  * applies), and output is a flat case class so downstream ops stay
  * columnar/codegen'd.
  */
object MultimodalOps {

  /** Typed decoded-asset row. */
  case class AssetFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Real still-image container parsing -- PNG IHDR and JPEG SOF
    * dimensions, both public formats:
    *
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the
    *    IHDR chunk is REQUIRED first -- 4-byte length, "IHDR", then
    *    width and height as 4-byte big-endian (PNG spec 11.2.2).
    *  - JPEG: `FF D8` (SOI), then a marker walk: every segment is
    *    `FF <marker> <2-byte BE length incl. itself>`; the frame
    *    header (SOF0..SOF15 minus DHT/JPG/DAC = C4/C8/CC) carries
    *    precision(1), height(2 BE), width(2 BE) (ITU T.81 B.2.2).
    *    Standalone markers (RSTn/TEM) and fill bytes have no length.
    *
    * Returns None for anything else -- truncated headers, non-image
    * bytes -- so callers can fall back without throwing inside a
    * partition task. Note both magics are invalid leading bytes for
    * UTF-8 text (0x89 and 0xFF are never lead bytes), so text
    * payloads can never false-positive as images. */
  object HeaderDecoder {
    private def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    private def be16(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def pngDims(p: Array[Byte]): Option[(Int, Int)] =
      if (p.length >= 24 && java.util.Arrays.equals(p, 0, 8, PngSig, 0, 8) &&
          new String(p, 12, 4, "US-ASCII") == "IHDR") {
        val (w, h) = (be32(p, 16), be32(p, 20))
        if (w > 0 && h > 0) Some((w, h)) else None
      } else None

    private def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

    def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return None
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= p.length) return None
        val m = p(j) & 0xff
        if (isSof(m)) {
          // j+1..j+2 length, j+3 precision, j+4..5 height, j+6..7 width
          if (j + 7 >= p.length) return None
          val (h, w) = (be16(p, j + 4), be16(p, j + 6))
          return if (w > 0 && h > 0) Some((w, h)) else None
        } else if (m == 0xd9 || m == 0xda) {
          return None // EOI / entropy-coded data: no frame header seen
        } else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i = j + 1 // standalone marker, no length field
        } else {
          if (j + 2 >= p.length) return None
          val len = be16(p, j + 1)
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    }

    /** (width, height, format) of a recognized still image. */
    def imageDims(p: Array[Byte]): Option[(Int, Int, String)] =
      pngDims(p).map { case (w, h) => (w, h, "png") }
        .orElse(jpegDims(p).map { case (w, h) => (w, h, "jpeg") })
  }

  /** The codec boundary: REAL header parsing for recognized image
    * containers (a still image is 1 frame); a deterministic
    * length-derived fake for everything else, so the synthetic
    * text-bytes corpus stays SQL-checkable. Full pixel decode would
    * slot in here the same way -- the surrounding plumbing (binary
    * column, typed mapPartitions, pruned projection) is unchanged
    * either way. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      HeaderDecoder.imageDims(payload) match {
        case Some((w, h, _)) => (w, h, 1)
        case None =>
          val n = payload.length
          ((n * 7 + 3) % 640 + 1, (n * 11 + 5) % 480 + 1, n % 30 + 1)
      }
  }

  /** Binary decode + feature extraction over a synthesized payload
    * column (documents' text bytes standing in for media bytes).
    * Output is SQL-checkable because the stub is deterministic. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    assets.mapPartitions { it =>
      // per-partition scope: a real decoder would init its codec here
      it.map { case (id, payload) =>
        val (w, h, f) = StubDecoder.decode(payload)
        AssetFeatures(id, payload.length.toLong, w, h, f)
      }
    }.toDF()
  }

  val decodeFeaturesSql: String =
    // octet_length(encode(...)), not length(...): Spark measures the
    // UTF-8 BYTE length of the payload; char-counting length()
    // diverges on non-ASCII text
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((octet_length(encode(text)) * 7 + 3) % 640 + 1 AS INT) AS width,
       CAST((octet_length(encode(text)) * 11 + 5) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
       FROM documents"""

  // ------------------------------------------------------------- resize

  /** Fit-box for resize planning. */
  val TargetW = 224
  val TargetH = 224

  case class ResizedAsset(doc_id: Long, src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int)

  /** Aspect-preserving resize PLANNING stage: computes the integer
    * destination dimensions that fit each asset inside
    * [[TargetW]]x[[TargetH]] (exact integer cross-multiplication --
    * no float scale factor, so both engines agree bit-for-bit). A
    * real build resizes the payload in the same per-partition pass;
    * the stub computes only the geometry. */
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, dir).as[AssetFeatures].mapPartitions { it =>
      it.map { a =>
        // width binds iff src aspect >= target aspect
        val widthBinds = a.width.toLong * TargetH >= a.height.toLong * TargetW
        val (dw, dh) =
          if (widthBinds)
            (TargetW, math.max(1L, a.height.toLong * TargetW / a.width).toInt)
          else
            (math.max(1L, a.width.toLong * TargetH / a.height).toInt, TargetH)
        ResizedAsset(a.doc_id, a.width, a.height, dw, dh)
      }
    }.toDF()
  }

  val resizePlanSql: String =
    s"""WITH d AS ($decodeFeaturesSql)
       SELECT doc_id, width AS src_w, height AS src_h,
         CAST(CASE WHEN CAST(width AS BIGINT) * $TargetH >= CAST(height AS BIGINT) * $TargetW
              THEN $TargetW
              ELSE greatest(1, (CAST(width AS BIGINT) * $TargetH) // height) END AS INT) AS dst_w,
         CAST(CASE WHEN CAST(width AS BIGINT) * $TargetH >= CAST(height AS BIGINT) * $TargetW
              THEN greatest(1, (CAST(height AS BIGINT) * $TargetW) // width)
              ELSE $TargetH END AS INT) AS dst_h
       FROM d"""

  // ------------------------------------------------------- frame sampling

  /** Keep every Nth frame. */
  val FrameStride = 5

  case class SampledFrame(doc_id: Long, frame_idx: Int, frame_fp: Long)

  /** Stride frame-sampling stage: one output row per kept frame with
    * a deterministic 60-bit frame fingerprint (the id a downstream
    * frame-level dedup keys on). The typed flatMap is the plumbing a
    * real frame extractor uses: per-partition decoder, one input row
    * fanning out to n_frames/stride flat rows. */
  def sampleFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, dir).as[AssetFeatures].flatMap { a =>
      Iterator.range(0, a.n_frames, FrameStride).map { i =>
        SampledFrame(a.doc_id, i, graft.functions.HashExprs.h15Utf8(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            s"frame:${a.doc_id}:$i")))
      }
    }.toDF()
  }

  val sampleFramesSql: String = {
    val fp = graft.ops.Hashing.h15Sql(
      "concat('frame:', CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR))")
    // fixed-width series + filter: DuckDB's generate_series cannot
    // take a lateral column bound (same workaround as embCentroidsSql);
    // the stub's n_frames is always in [1, 30]
    s"""WITH d AS ($decodeFeaturesSql)
       SELECT doc_id, CAST(i AS INT) AS frame_idx, $fp AS frame_fp
       FROM d, generate_series(0, 29) gs(i)
       WHERE i < n_frames AND i % $FrameStride = 0"""
  }
}
