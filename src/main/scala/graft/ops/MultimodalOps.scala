package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition (SURVEY.md S7.6).
  *
  * Two tiers. The LEGACY tier (decodeFeatures / resizePlan /
  * sampleFrames) parses real PNG/JPEG headers and falls back to
  * [[StubDecoder]]'s deterministic fake for non-image bytes, keeping
  * the text-bytes corpus SQL-checkable. The REAL tier (`pixel*` /
  * `imagePhash*` / `audioDecode`, round 10) runs full pure-JVM codec
  * loops via [[PixelCodec]] -- actual PNG/BMP pixels and WAV samples
  * through a binary column, decoded and feature-extracted with
  * exact-integer math the DuckDB oracle reproduces from the pixel
  * formula, proving the codecs byte-for-byte.
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

  // ------------------------------------------------- REAL pixel path
  //
  // The queries below run actual codec loops: pixels synthesized from
  // a closed-form integer formula, encoded to REAL container bytes
  // (PNG with cycling scanline filters / 24-bit BMP / PCM WAV) into a
  // binary DataFrame column, then decoded back by PixelCodec and
  // feature-extracted. The DuckDB oracle computes the same features
  // straight from the formula -- so a hash match proves the entire
  // encode -> binary column -> decode pipeline is lossless and
  // byte-correct, not just the plumbing around it. All feature math
  // is exact-integer (sums, truncating division, scaled comparisons),
  // per the cross-engine determinism rules.

  /** Pixel synthesis: `((d % 1000003) * 2654435761 + i * 40503) % 256`
    * -- a Weyl-ish integer mix, closed-form in ANSI SQL, bounded so
    * every intermediate fits a BIGINT under ANSI overflow checks. */
  val PxA = 2654435761L
  val PxB = 40503L
  val PxDocMod = 1000003L
  val PxW = 24; val PxH = 18
  val HashW = 9; val HashH = 8
  val NearDupSpan = 10L
  val HammingMax = 10
  val AudioRate = 16000

  private def synthPx(d: Long, i: Int): Int =
    (((d % PxDocMod) * PxA + i * PxB) % 256L).toInt

  /** Near-dup variant: docs sharing `doc_id / 10` (a SPAN of ten
    * consecutive ids) get the same base image; a per-doc nudge (+1 on
    * the first `doc_id % 4` pixels) keeps them near- rather than
    * exact duplicates. The group key is a fixed-SIZE span, not a
    * fixed-COUNT modulus (`% 200` until r12): a modulus keeps 200
    * groups whose membership grows with the corpus, so pair work —
    * the thing the banded join is supposed to bound — grew
    * quadratically with scale BY FIXTURE CONSTRUCTION and the 10x
    * bench point measured the fixture, not the operator. A span
    * keeps duplicate density invariant: group size is 10 at every
    * scale, group count grows linearly, and upsampled id spaces
    * (offsets >> span) can never fuse groups across replicas. Base
    * pixels come from the engine's cross-engine md5 hash, NOT an
    * algebraic mix: linear and multiplicative formulas leave residual
    * structure mod 256 (constant phase shifts, doubling relations)
    * that pulls DIFFERENT groups' dHashes within the Hamming gate --
    * the planted spec caught two such collapses before this landed.
    * h15 makes cross-group hashes independent while staying exact in
    * both engines. */
  private def synthNearDupPx(d: Long, i: Int): Int =
    ((Hashing.h15Local(s"img:${d / NearDupSpan}:$i") % 256L +
      (if (i < (d % 4)) 1L else 0L)) % 256L).toInt

  private val pxSqlExpr =
    s"((doc_id % $PxDocMod) * $PxA + i * $PxB) % 256"

  case class PixelFeatures(doc_id: Long, format: String, n_ch: Int,
      width: Int, height: Int, px_sum: Long, px_min: Int, px_max: Int,
      px_wsum: Long)

  /** The asset table: one REAL container payload per document --
    * doc_id % 4 = 0 encodes 24x18 RGB as BMP, = 1 greyscale PNG,
    * = 2 RGB PNG (filter-cycled), = 3 greyscale GIF (real LZW). The
    * binary column is what a real multimodal corpus stores;
    * everything downstream must detect the container from the
    * bytes. */
  def pixelAssets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val nch = if (d % 4 == 1 || d % 4 == 3) 1 else 3
          val px = Array.tabulate(PxW * PxH * nch)(i => synthPx(d, i).toByte)
          val img = PixelCodec.Image(PxW, PxH, nch, px)
          val payload = (d % 4) match {
            case 0 => PixelCodec.encodeBmp(img)
            case 3 => PixelCodec.encodeGif(img)
            case _ => PixelCodec.encodePng(img)
          }
          (d, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Full decode: container sniffed from bytes (PNG, BMP, then GIF),
    * pixels recovered, exact-integer features extracted. One codec
    * init per partition; input projected to (doc_id, payload). */
  def pixelDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pixelAssets(s, dir).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (d, payload) =>
        val (img, fmt) = PixelCodec.decodePng(payload).map((_, "png"))
          .orElse(PixelCodec.decodeBmp(payload).map((_, "bmp")))
          .orElse(PixelCodec.decodeGif(payload).map((_, "gif")))
          .getOrElse(throw new IllegalStateException(
            s"undecodable asset for doc $d"))
        var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < img.pixels.length) {
          val p = img.pixels(i) & 0xff
          sum += p; wsum += (i + 1L) * p
          if (p < mn) mn = p
          if (p > mx) mx = p
          i += 1
        }
        PixelFeatures(d, fmt, img.channels, img.width, img.height,
          sum, mn, mx, wsum)
      }
    }.toDF()
  }

  val pixelDecodeSql: String =
    s"""WITH d AS (
         SELECT doc_id,
           CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 3 END AS n_ch,
           CASE WHEN doc_id % 4 = 0 THEN 'bmp'
                WHEN doc_id % 4 = 3 THEN 'gif' ELSE 'png' END AS format
         FROM documents),
       px AS (
         SELECT d.doc_id, d.n_ch, d.format, gs.i,
           ((d.doc_id % $PxDocMod) * $PxA + gs.i * $PxB) % 256 AS p
         FROM d, generate_series(0, ${PxW * PxH * 3 - 1}) gs(i)
         WHERE gs.i < ${PxW * PxH} * d.n_ch)
       SELECT doc_id, format, CAST(n_ch AS INT) AS n_ch,
         CAST($PxW AS INT) AS width, CAST($PxH AS INT) AS height,
         CAST(sum(p) AS BIGINT) AS px_sum,
         CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max,
         CAST(sum((i + 1) * p) AS BIGINT) AS px_wsum
       FROM px GROUP BY doc_id, format, n_ch"""

  case class ResizedPixels(doc_id: Long, r_sum: Long, r_min: Int,
      r_max: Int, r_wsum: Long)

  /** Decode + REAL box-average resize 24x18 -> 5x4 (deliberately
    * non-divisible so the floor-partition boxes vary in size) with
    * features over the resized pixels. */
  def pixelResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(PxW * PxH)(i => synthPx(d, i).toByte)
          (d, PixelCodec.encodePng(PixelCodec.Image(PxW, PxH, 1, px)))
        }
      }.toDF("doc_id", "payload")
    assets.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (d, payload) =>
        val img = PixelCodec.decodePng(payload).get
        val r = PixelCodec.resizeArea(img, 5, 4)
        var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
        var j = 0
        while (j < r.pixels.length) {
          val p = r.pixels(j) & 0xff
          sum += p; wsum += (j + 1L) * p
          if (p < mn) mn = p
          if (p > mx) mx = p
          j += 1
        }
        ResizedPixels(d, sum, mn, mx, wsum)
      }
    }.toDF()
  }

  val pixelResizeSql: String =
    s"""WITH px AS (
         SELECT doc_id, i, (i % $PxW) AS c, (i // $PxW) AS r,
           $pxSqlExpr AS p
         FROM documents, generate_series(0, ${PxW * PxH - 1}) gs(i)),
       cell AS (
         SELECT doc_id, (r * 4 // $PxH) AS dy, (c * 5 // $PxW) AS dx,
           sum(p) // count(*) AS q
         FROM px GROUP BY doc_id, dy, dx)
       SELECT doc_id, CAST(sum(q) AS BIGINT) AS r_sum,
         CAST(min(q) AS INT) AS r_min, CAST(max(q) AS INT) AS r_max,
         CAST(sum((dy * 5 + dx + 1) * q) AS BIGINT) AS r_wsum
       FROM cell GROUP BY doc_id"""

  case class PhashRow(doc_id: Long, dhash_lo: Long, dhash_hi: Long,
      ahash_lo: Long, ahash_hi: Long)

  /** Synthesized 9x8 grey PNG asset table for the phash gates. */
  private def phashAssets(s: SparkSession, dir: String,
      synth: (Long, Int) => Int): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(HashW * HashH)(i => synth(d, i).toByte)
          (d, PixelCodec.encodePng(PixelCodec.Image(HashW, HashH, 1, px)))
        }
      }.toDF("doc_id", "payload")
  }

  /** GENERAL perceptual-hash stage for any binary image column:
    * container-sniff (PNG, then BMP) -> greyscale -> 9x8 box-average
    * -> dHash halves plus aHash halves of the left 8x8 subgrid. On a
    * 9x8 grey input the grey/resize steps are identities, which is
    * what lets the formula oracle gate this exact code path. Output:
    * (doc_id, dhash_lo, dhash_hi, ahash_lo, ahash_hi).
    *
    * Runs as the native [[graft.functions.ImagePhash]] expression
    * (strict: undecodable bytes fail the job loudly), so the whole
    * decode+hash sits INSIDE whole-stage codegen -- no typed Dataset
    * boundary; subexpression elimination keeps the decode at one
    * evaluation across the four extracted fields. */
  def imageDhashOf(assets: DataFrame, idCol: Column,
      payloadCol: Column): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val h = ColumnBridge.column(graft.functions.ImagePhash(
      ColumnBridge.expression(payloadCol), strict = true))
    assets.select(idCol.cast("long").as("doc_id"), h.as("__h"))
      .select(col("doc_id"), col("__h.*"))
  }

  def imagePhash(s: SparkSession, dir: String): DataFrame =
    imageDhashOf(phashAssets(s, dir, synthPx), col("doc_id"),
      col("payload"))

  /** Shared oracle fragment: (doc_id, lo, hi) dHash halves computed
    * from a pixel formula `pxExpr` over the 9x8 grid. */
  private def dhashSqlCte(pxExpr: String): String =
    s"""px AS (
         SELECT doc_id, i, $pxExpr AS p
         FROM documents, generate_series(0, ${HashW * HashH - 1}) gs(i)),
       cmp AS (
         SELECT a.doc_id, (a.i // $HashW) * 8 + (a.i % $HashW) AS b,
           CASE WHEN n.p > a.p THEN 1 ELSE 0 END AS bit
         FROM px a JOIN px n
           ON n.doc_id = a.doc_id AND n.i = a.i + 1
         WHERE a.i % $HashW < 8),
       h AS (
         SELECT doc_id,
           CAST(sum(CASE WHEN b < 32
             THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
             AS lo,
           CAST(sum(CASE WHEN b >= 32
             THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
             AS BIGINT) AS hi
         FROM cmp GROUP BY doc_id)"""

  val imagePhashSql: String =
    s"""WITH ${dhashSqlCte(pxSqlExpr)},
       asum AS (
         SELECT doc_id, sum(p) AS s FROM px
         WHERE i % $HashW < 8 GROUP BY doc_id),
       abit AS (
         SELECT px.doc_id, (px.i // $HashW) * 8 + (px.i % $HashW) AS b,
           CASE WHEN 64 * px.p > asum.s THEN 1 ELSE 0 END AS bit
         FROM px JOIN asum ON asum.doc_id = px.doc_id
         WHERE px.i % $HashW < 8),
       a2 AS (
         SELECT doc_id,
           CAST(sum(CASE WHEN b < 32
             THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
             AS ahash_lo,
           CAST(sum(CASE WHEN b >= 32
             THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
             AS BIGINT) AS ahash_hi
         FROM abit GROUP BY doc_id)
       SELECT h.doc_id, h.lo AS dhash_lo, h.hi AS dhash_hi,
         ahash_lo, ahash_hi
       FROM h JOIN a2 ON a2.doc_id = h.doc_id"""

  /** Image near-duplicate pairs by banded dHash -- the MinHash-LSH
    * discipline applied to pixels: the 64-bit dHash splits into four
    * 16-bit bands, candidates share at least one band (equi-join,
    * never all-pairs), and the exact Hamming distance verifies inside
    * the join output. At 100 TB pair work is sum over (band, value)
    * buckets of bucket^2 -- corpus^2 never appears. Works on ANY
    * binary image column the codecs recognize. */
  /** (doc_id, lo, hi) -> one row per 16-bit band: (.., bi, bv). */
  private def phashBands(h: DataFrame): DataFrame =
    h.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(65535L)), shiftright(col("lo"), 16),
        col("hi").bitwiseAND(lit(65535L)), shiftright(col("hi"), 16)))
        .as(Seq("bi", "bv")))

  private def hammingExpr(aSuf: String, bSuf: String): Column =
    (bit_count(col(s"lo_$aSuf").bitwiseXOR(col(s"lo_$bSuf"))) +
      bit_count(col(s"hi_$aSuf").bitwiseXOR(col(s"hi_$bSuf")))).cast("int")

  /** First-colliding-band rule for the 4x16-bit phash banding: a pair
    * agreeing on several bands matches the equi-join once per shared
    * band; emit only where no EARLIER band also agrees. Both sides
    * carry the full hash (lo, hi), so earlier bands are recomputable
    * inline -- single emission per pair with NO distinct over the
    * candidate blowup (r15, guide §2.4: the old shape shuffled every
    * 6-column candidate row through a DISTINCT exchange before the
    * hamming filter; same discipline as the text-LSH joins). */
  private def firstCollidingPhashBand(aSuf: String, bSuf: String): Column = {
    def band(suf: String, i: Int): Column = i match {
      case 0 => col(s"lo_$suf").bitwiseAND(lit(65535L))
      case 1 => shiftright(col(s"lo_$suf"), 16)
      case 2 => col(s"hi_$suf").bitwiseAND(lit(65535L))
      case 3 => shiftright(col(s"hi_$suf"), 16)
    }
    (0 until 4).map { i =>
      col("bi") <= i || band(aSuf, i) =!= band(bSuf, i)
    }.reduce(_ && _)
  }

  /** Banded near-dup pairs from an already-computed hash table
    * (doc_id, lo, hi): (doc_a, doc_b, hamming), doc_a < doc_b. */
  def imagePhashPairsFromHashes(h: DataFrame,
      maxHamming: Int): DataFrame = {
    val bands = phashBands(h)
    val a = bands.select(col("doc_id").as("doc_a"), col("lo").as("lo_a"),
      col("hi").as("hi_a"), col("bi"), col("bv"))
    val b = bands.select(col("doc_id").as("doc_b"), col("lo").as("lo_b"),
      col("hi").as("hi_b"), col("bi").as("bi_b"), col("bv").as("bv_b"))
    val hamming = hammingExpr("a", "b")
    a.join(b, col("bi") === col("bi_b") && col("bv") === col("bv_b") &&
        col("doc_a") < col("doc_b") &&
        firstCollidingPhashBand("a", "b") && hamming <= maxHamming)
      .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
  }

  /** Incremental variant: new hashes vs an EXISTING hash index --
    * (new_id, existing_id, hamming). The corpus side is the stored
    * 3-column index (never re-decoded); cost is the batch's bands
    * plus its bucket collisions against the index. */
  def imagePhashPairsBetween(newH: DataFrame, corpusH: DataFrame,
      maxHamming: Int): DataFrame = {
    val a = phashBands(newH).select(col("doc_id").as("new_id"),
      col("lo").as("lo_a"), col("hi").as("hi_a"), col("bi"), col("bv"))
    val b = phashBands(corpusH).select(col("doc_id").as("existing_id"),
      col("lo").as("lo_b"), col("hi").as("hi_b"),
      col("bi").as("bi_b"), col("bv").as("bv_b"))
    val hamming = hammingExpr("a", "b")
    a.join(b, col("bi") === col("bi_b") && col("bv") === col("bv_b") &&
        firstCollidingPhashBand("a", "b") && hamming <= maxHamming)
      .select(col("new_id"), col("existing_id"), hamming.as("hamming"))
  }

  def imagePhashPairsOf(assets: DataFrame, idCol: Column,
      payloadCol: Column, maxHamming: Int): DataFrame = {
    // materialize the codec-heavy hash stage ONCE: both sides of the
    // band self-join read the 3-column hash table, not the decode
    // pipeline (same discipline as the text LSH joins)
    val h = DedupOps.materializeOnce(
      imageDhashOf(assets, idCol, payloadCol)
        .select(col("doc_id"), col("dhash_lo").as("lo"),
          col("dhash_hi").as("hi")))
    imagePhashPairsFromHashes(h, maxHamming)
  }

  def imagePhashDedup(s: SparkSession, dir: String): DataFrame =
    imagePhashPairsOf(phashAssets(s, dir, synthNearDupPx),
      col("doc_id"), col("payload"), HammingMax)

  val imagePhashDedupSql: String = {
    val h = graft.ops.Hashing.h15Sql("concat('img:', " +
      s"CAST(doc_id // $NearDupSpan AS VARCHAR), ':', CAST(i AS VARCHAR))")
    val nd = s"($h % 256 + CASE WHEN i < doc_id % 4 THEN 1 ELSE 0 END) % 256"
    s"""WITH ${dhashSqlCte(nd)},
       bands AS (
         SELECT doc_id, lo, hi, bi,
           CASE bi WHEN 0 THEN lo & 65535 WHEN 1 THEN lo >> 16
                   WHEN 2 THEN hi & 65535 ELSE hi >> 16 END AS bv
         FROM h, generate_series(0, 3) g(bi)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, a.lo AS lo_a, a.hi AS hi_a,
           b.doc_id AS doc_b, b.lo AS lo_b, b.hi AS hi_b
         FROM bands a JOIN bands b
           ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b,
         CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
           AS INT) AS hamming
       FROM cand
       WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
         <= $HammingMax"""
  }

  /** GIF round-trip over the real COMPRESSED image path: synthesize a
    * 24x18 grey image per doc from the closed-form pixel mix, push it
    * through [[PixelCodec.encodeGif]] -> [[PixelCodec.decodeGif]]
    * (spec-implemented LZW: variable code widths, 4096-reset, real
    * compression), then roll up exact integer features of the DECODED
    * pixels — sum, min, max, and a position-weighted sum that pins
    * pixel ORDER (sum/min/max alone would pass a permutation).
    *
    * LZW is lossless, so the DuckDB oracle recomputes the features
    * from the synthesis FORMULA alone: a hash match proves
    * decode(encode(px)) == px for every doc without the oracle ever
    * seeing a GIF byte — the same gating trick as the WAV path. The
    * byte codec is the documented mapPartitions exception; the rollup
    * is one map-side-combinable aggregation-free projection (one row
    * per doc), embarrassingly parallel at any scale. */
  def gifRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(PxW * PxH)(i => synthPx(d, i).toByte)
          val bytes = PixelCodec.encodeGif(
            PixelCodec.Image(PxW, PxH, 1, px))
          val img = PixelCodec.decodeGif(bytes).getOrElse(
            throw new IllegalStateException(s"GIF decode failed for doc $d"))
          require(img.width == PxW && img.height == PxH &&
            img.channels == 1, s"GIF round-trip shape drifted for doc $d")
          var sum = 0L; var mn = 255; var mx = 0; var wsum = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            wsum += (i + 1L) * v
            i += 1
          }
          (d, sum, mn, mx, wsum)
        }
      }.toDF("doc_id", "px_sum", "px_min", "px_max", "px_wsum")
  }

  /** DuckDB twin: the synthesis formula only — never a GIF byte. */
  val gifRoundtripSql: String =
    s"""WITH px AS (
         SELECT doc_id, gs.i, $pxSqlExpr AS p
         FROM documents, generate_series(0, ${PxW * PxH - 1}) gs(i))
       SELECT doc_id, CAST(sum(p) AS BIGINT) AS px_sum,
              CAST(min(p) AS INT) AS px_min,
              CAST(max(p) AS INT) AS px_max,
              CAST(sum((i + 1) * p) AS BIGINT) AS px_wsum
       FROM px GROUP BY doc_id"""

  /** JPEG round-trip under the EXACT hash gate — possible despite
    * JPEG being lossy because the fixture images are CONSTANT PER
    * 8x8 BLOCK: every AC coefficient is exactly 0, the DC coefficient
    * 8*(v-128) is an exact double, and with [[JpegCodec.QuantExact]]
    * (DC step 8) the quantize/dequantize/IDCT chain reproduces v
    * exactly (see JpegCodec's object doc for the arithmetic). Each
    * doc synthesizes a 24x18 grey image whose value varies per
    * (doc, block), runs encodeJpeg -> decodeJpeg — real markers,
    * real canonical Huffman, real bit stream with byte stuffing, DC
    * prediction across blocks, edge-replicated partial MCUs — and
    * hashes order-pinning integer features of the decoded pixels.
    * The DuckDB oracle recomputes the block-value formula; it never
    * sees a JPEG byte. The AC/IDCT/color paths (necessarily inexact
    * cross-implementation) are bounded against ImageIO in
    * JpegCodecSpec instead. */
  def jpegRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(PxW * PxH) { i =>
            val bx = (i % PxW) / 8; val by = (i / PxW) / 8
            (((d % PxDocMod) * 31 + bx * 7 + by * 13) % 256).toByte
          }
          val bytes = JpegCodec.encodeJpeg(
            PixelCodec.Image(PxW, PxH, 1, px), JpegCodec.QuantExact)
          val img = JpegCodec.decodeJpeg(bytes).getOrElse(
            throw new IllegalStateException(s"JPEG decode failed for doc $d"))
          require(img.width == PxW && img.height == PxH &&
            img.channels == 1, s"JPEG round-trip shape drifted for doc $d")
          var sum = 0L; var mn = 255; var mx = 0; var wsum = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            wsum += (i + 1L) * v
            i += 1
          }
          (d, sum, mn, mx, wsum)
        }
      }.toDF("doc_id", "px_sum", "px_min", "px_max", "px_wsum")
  }

  /** DuckDB twin: the block-value formula only — never a JPEG byte. */
  val jpegRoundtripSql: String =
    s"""WITH px AS (
         SELECT doc_id, gs.i,
           ((doc_id % $PxDocMod) * 31 + ((gs.i % $PxW) // 8) * 7 +
            ((gs.i // $PxW) // 8) * 13) % 256 AS p
         FROM documents, generate_series(0, ${PxW * PxH - 1}) gs(i))
       SELECT doc_id, CAST(sum(p) AS BIGINT) AS px_sum,
              CAST(min(p) AS INT) AS px_min,
              CAST(max(p) AS INT) AS px_max,
              CAST(sum((i + 1) * p) AS BIGINT) AS px_wsum
       FROM px GROUP BY doc_id"""

  /** PROGRESSIVE JPEG (SOF2, r13) under the same EXACT hash gate as
    * [[jpegRoundtrip]] — the constant-per-block argument is scan-order
    * independent, so spectral selection changes nothing about the
    * reconstruction: encodeJpegProgressive emits an interleaved DC
    * scan plus per-component AC band scans, decodeJpeg accumulates
    * them across scans and reconstructs at EOI. What this puts under
    * the driver's gate that the baseline gate cannot: multi-scan SOS
    * parsing, the DC band decode, AC band decode with EOB runs, and
    * the coefficient-store reconstruction. Block values use DIFFERENT
    * multipliers than the baseline gate so the two rows cannot mask
    * each other. (Successive-approximation refinement is
    * cross-validated against ImageIO's progressive writer in
    * JpegCodecSpec — its bit choices are writer-specific and
    * inherently not exactness-gateable.) */
  def jpegProgressive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(PxW * PxH) { i =>
            val bx = (i % PxW) / 8; val by = (i / PxW) / 8
            (((d % PxDocMod) * 17 + bx * 29 + by * 5) % 256).toByte
          }
          val bytes = JpegCodec.encodeJpegProgressive(
            PixelCodec.Image(PxW, PxH, 1, px), JpegCodec.QuantExact)
          val img = JpegCodec.decodeJpeg(bytes).getOrElse(
            throw new IllegalStateException(
              s"progressive JPEG decode failed for doc $d"))
          require(img.width == PxW && img.height == PxH &&
            img.channels == 1,
            s"progressive JPEG round-trip shape drifted for doc $d")
          var sum = 0L; var mn = 255; var mx = 0; var wsum = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            wsum += (i + 1L) * v
            i += 1
          }
          (d, sum, mn, mx, wsum)
        }
      }.toDF("doc_id", "px_sum", "px_min", "px_max", "px_wsum")
  }

  /** DuckDB twin: the block-value formula only — never a JPEG byte. */
  val jpegProgressiveSql: String =
    s"""WITH px AS (
         SELECT doc_id, gs.i,
           ((doc_id % $PxDocMod) * 17 + ((gs.i % $PxW) // 8) * 29 +
            ((gs.i // $PxW) // 8) * 5) % 256 AS p
         FROM documents, generate_series(0, ${PxW * PxH - 1}) gs(i))
       SELECT doc_id, CAST(sum(p) AS BIGINT) AS px_sum,
              CAST(min(p) AS INT) AS px_min,
              CAST(max(p) AS INT) AS px_max,
              CAST(sum((i + 1) * p) AS BIGINT) AS px_wsum
       FROM px GROUP BY doc_id"""

  /** ARITHMETIC-coded JPEG (SOF9 + DAC, r14) under the hash gate:
    * the same constant-block exactness trick as the baseline and
    * progressive gates — encode with the QM coder, decode back, hash
    * order-pinning integer features; the oracle recomputes the
    * synthesis formula and never sees a JPEG byte. The entropy layer
    * itself is additionally pinned BYTE-EXACT against libjpeg62
    * fixtures in JpegArithSpec (an independent implementation of the
    * same T.81 Annex D coder). */
  def jpegArith(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val px = Array.tabulate(PxW * PxH) { i =>
            val bx = (i % PxW) / 8; val by = (i / PxW) / 8
            (((d % PxDocMod) * 19 + bx * 23 + by * 7) % 256).toByte
          }
          val bytes = JpegCodec.encodeJpegArith(
            PixelCodec.Image(PxW, PxH, 1, px), JpegCodec.QuantExact)
          val img = JpegCodec.decodeJpeg(bytes).getOrElse(
            throw new IllegalStateException(
              s"arithmetic JPEG decode failed for doc $d"))
          require(img.width == PxW && img.height == PxH &&
            img.channels == 1,
            s"arithmetic JPEG round-trip shape drifted for doc $d")
          var sum = 0L; var mn = 255; var mx = 0; var wsum = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            wsum += (i + 1L) * v
            i += 1
          }
          (d, bytes.length.toLong, sum, mn, mx, wsum)
        }
      }.toDF("doc_id", "n_bytes", "px_sum", "px_min", "px_max", "px_wsum")
      // the byte length is engine-side-only evidence (the oracle
      // cannot know it); keep the hashable columns formula-derivable
      .drop("n_bytes")
  }

  /** DuckDB twin: the block-value formula only — never a JPEG byte.
    * Integer division spelled portably (the verify skill's rule for
    * new oracles). */
  val jpegArithSql: String =
    s"""WITH px AS (
         SELECT doc_id, gs.i,
           ((doc_id % $PxDocMod) * 19 +
            CAST(floor((gs.i % $PxW) / 8.0) AS BIGINT) * 23 +
            CAST(floor(floor(gs.i / $PxW.0) / 8.0) AS BIGINT) * 7) % 256 AS p
         FROM documents CROSS JOIN generate_series(0, ${PxW * PxH - 1}) gs(i))
       SELECT doc_id, CAST(sum(p) AS BIGINT) AS px_sum,
              CAST(min(p) AS INT) AS px_min,
              CAST(max(p) AS INT) AS px_max,
              CAST(sum((i + 1) * p) AS BIGINT) AS px_wsum
       FROM px GROUP BY doc_id"""

  // ------------------------------------------------- real frame path

  val FrameW = 12; val FrameH = 10
  val FrameSampleStride = 2

  case class FrameFeatures(doc_id: Long, frame_idx: Int, n_frames: Int,
      f_sum: Long, f_min: Int, f_max: Int)

  /** REAL frame sampling: per doc an animated PNG with `2 + d % 5`
    * full-size 12x10 grey frames (frame f's pixel i is
    * `synthPx(d, f*120 + i)`), encoded to actual APNG bytes, decoded
    * back frame-by-frame, stride-sampled (every 2nd frame), and
    * feature-extracted per kept frame. The oracle computes the same
    * features from the formula -- proving the multi-frame container
    * loop (acTL/fcTL/fdAT sequencing, per-frame zlib streams) the way
    * the still-image gates prove IDAT. */
  def frameDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perFrame = FrameW * FrameH
    val assets = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (2 + d % 5).toInt
          val frames = (0 until n).map { f =>
            PixelCodec.Image(FrameW, FrameH, 1,
              Array.tabulate(perFrame)(i =>
                synthPx(d, f * perFrame + i).toByte))
          }
          (d, PixelCodec.encodeApng(frames))
        }
      }.toDF("doc_id", "payload")
    assets.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (d, payload) =>
        val frames = PixelCodec.decodeApng(payload).getOrElse(
          throw new IllegalStateException(s"undecodable APNG for doc $d"))
        frames.zipWithIndex
          .filter { case (_, f) => f % FrameSampleStride == 0 }
          .map { case (img, f) =>
            var sum = 0L; var mn = 255; var mx = 0
            var i = 0
            while (i < img.pixels.length) {
              val p = img.pixels(i) & 0xff
              sum += p
              if (p < mn) mn = p
              if (p > mx) mx = p
              i += 1
            }
            FrameFeatures(d, f, frames.size, sum, mn, mx)
          }
      }
    }.toDF()
  }

  val frameDecodeSql: String = {
    val perFrame = FrameW * FrameH
    s"""WITH d AS (
         SELECT doc_id, 2 + doc_id % 5 AS n_frames FROM documents),
       px AS (
         SELECT d.doc_id, d.n_frames, gs.j // $perFrame AS f,
           ((d.doc_id % $PxDocMod) * $PxA + gs.j * $PxB) % 256 AS p
         FROM d, generate_series(0, ${perFrame * 6 - 1}) gs(j)
         WHERE gs.j < $perFrame * d.n_frames)
       SELECT doc_id, CAST(f AS INT) AS frame_idx,
         CAST(n_frames AS INT) AS n_frames,
         CAST(sum(p) AS BIGINT) AS f_sum,
         CAST(min(p) AS INT) AS f_min, CAST(max(p) AS INT) AS f_max
       FROM px WHERE f % $FrameSampleStride = 0
       GROUP BY doc_id, f, n_frames"""
  }

  // -------------------------------------------------- real audio path

  case class AudioFeatures(doc_id: Long, n_samples: Long, sum_sq: Long,
      zero_cross: Long, peak: Int)

  /** PCM synthesis -> REAL WAV bytes -> chunk-walk decode -> exact
    * integer DSP features (energy, zero crossings, peak). Sample t of
    * doc d: `((d % 1000003) * 31 + t * 17) % 65536 - 32768`. */
  def audioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (800 + d % 400).toInt
          val samples = Array.tabulate(n)(t =>
            (((d % PxDocMod) * 31 + t * 17) % 65536 - 32768).toShort)
          (d, PixelCodec.encodeWav(samples, AudioRate))
        }
      }.toDF("doc_id", "payload")
    assets.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (d, payload) =>
        val (samples, _) = PixelCodec.decodeWav(payload).get
        var sq = 0L; var zc = 0L; var peak = 0
        var t = 0
        while (t < samples.length) {
          val v = samples(t).toInt
          sq += v.toLong * v
          if (t >= 1 && (v < 0) != (samples(t - 1) < 0)) zc += 1
          if (math.abs(v) > peak) peak = math.abs(v)
          t += 1
        }
        AudioFeatures(d, samples.length.toLong, sq, zc, peak)
      }
    }.toDF()
  }

  val audioDecodeSql: String =
    s"""WITH t AS (
         SELECT doc_id, gs.t,
           ((doc_id % $PxDocMod) * 31 + gs.t * 17) % 65536 - 32768 AS s,
           ((doc_id % $PxDocMod) * 31 + (gs.t - 1) * 17) % 65536 - 32768
             AS prev
         FROM documents, generate_series(0, 1199) gs(t)
         WHERE gs.t < 800 + doc_id % 400)
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         CAST(sum(CASE WHEN t >= 1 AND ((s < 0) <> (prev < 0))
           THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
         CAST(max(abs(s)) AS INT) AS peak
       FROM t GROUP BY doc_id"""

  /** FLAC over the same synthesized PCM: encode each doc's samples as
    * a REAL compressed FLAC stream ([[FlacCodec]] — frames, FIXED
    * predictors, Rice residuals, CRC-8/16, MD5), decode it back, and
    * roll up the DECODED samples position-pinned. FLAC is lossless,
    * so the DuckDB oracle computes the identical rollup straight from
    * the synthesis formula and the hash must match bit-for-bit — the
    * gzip/GIF lossless-gate trick, now for the dominant compressed
    * audio interchange format. Stereo interleave: channel 1 is the
    * negated signal, which makes the encoder's side-channel
    * decorrelation (l - r = 2l) a real code path under the gate.
    * Per-row work, embarrassingly parallel — the 100 TB shape is
    * "decode arrives with the scan", no shuffle introduced. */
  def audioFlac(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (800 + d % 400).toInt
          val mono = Array.tabulate(n)(t =>
            (((d % PxDocMod) * 31 + t * 17) % 65536 - 32768).toShort)
          // stereo: (s, -s) — drives the side-channel assignments
          val inter = new Array[Short](2 * n)
          var t = 0
          while (t < n) {
            inter(2 * t) = mono(t)
            val neg = -mono(t).toInt
            // -(-32768) overflows 16-bit: clamp to 32767 (still a
            // deterministic pure function of the synthesis)
            inter(2 * t + 1) =
              (if (neg > 32767) 32767 else neg).toShort
            t += 1
          }
          val bytes = FlacCodec.encode(inter, AudioRate, 2)
          val (dec, rate, ch) = FlacCodec.decode(bytes).getOrElse(
            throw new IllegalStateException(s"flac decode failed for doc $d"))
          require(rate == AudioRate && ch == 2 && dec.length == 2 * n,
            s"flac round-trip shape drifted for doc $d")
          var sumL = 0L; var sumR = 0L; var wsum = 0L
          var mn = Int.MaxValue; var mx = Int.MinValue
          t = 0
          while (t < n) {
            val l = dec(2 * t).toInt; val r = dec(2 * t + 1).toInt
            sumL += l; sumR += r
            wsum += (t + 1L) * l
            if (l < mn) mn = l
            if (l > mx) mx = l
            t += 1
          }
          (d, n.toLong, sumL, sumR, mn, mx, wsum, bytes.length.toLong)
        }
      }.toDF("doc_id", "n_samples", "sum_l", "sum_r", "min_l", "max_l",
        "wsum", "n_bytes")
      // the byte size is encoder-internal (not oracle-checkable);
      // expose a CODEC-HONESTY boolean instead: the compressed stream
      // must undercut raw PCM (4 bytes/sample here)
      .withColumn("compressed", col("n_bytes") < col("n_samples") * 4)
      .drop("n_bytes")
  }

  /** DuckDB twin: the rollup on the synthesis directly — losslessness
    * IS the assertion (any codec bit-slip flips a sum). */
  val audioFlacSql: String =
    s"""WITH t AS (
         SELECT doc_id, gs.t,
           ((doc_id % $PxDocMod) * 31 + gs.t * 17) % 65536 - 32768 AS s
         FROM documents, generate_series(0, 1199) gs(t)
         WHERE gs.t < 800 + doc_id % 400)
       SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(s) AS BIGINT) AS sum_l,
         CAST(sum(CASE WHEN -s > 32767 THEN 32767 ELSE -s END) AS BIGINT)
           AS sum_r,
         CAST(min(s) AS INT) AS min_l,
         CAST(max(s) AS INT) AS max_l,
         CAST(sum((t + 1) * s) AS BIGINT) AS wsum,
         TRUE AS compressed
       FROM t GROUP BY doc_id"""

  /** G.711 mu-law over the real WAV path: PCM synthesis -> mu-law WAV
    * bytes (format tag 7, a REAL compressed telephony container) ->
    * chunk-walk decode with per-sample reconstruction -> per-doc
    * rollup of the RECONSTRUCTED samples, position-pinned. mu-law is
    * lossy but STATELESS — quantize/reconstruct is a pure integer bit
    * formula per sample — so the DuckDB oracle applies the same
    * clip/bias/segment/mantissa algebra to the synthesized PCM and
    * the hash must match bit-for-bit: a full lossy audio codec under
    * the exact cross-engine gate, no constant-block trick needed. */
  def audioUlaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (800 + d % 400).toInt
          val samples = Array.tabulate(n)(t =>
            (((d % PxDocMod) * 31 + t * 17) % 65536 - 32768).toShort)
          val bytes = PixelCodec.encodeWavUlaw(samples, AudioRate)
          val (dec, rate) = PixelCodec.decodeWavUlaw(bytes).getOrElse(
            throw new IllegalStateException(s"ulaw decode failed for doc $d"))
          require(rate == AudioRate && dec.length == n,
            s"ulaw round-trip shape drifted for doc $d")
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var wsum = 0L
          var t = 0
          while (t < n) {
            val v = dec(t).toInt
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            wsum += (t + 1L) * v
            t += 1
          }
          (d, n.toLong, sum, mn, mx, wsum)
        }
      }.toDF("doc_id", "n_samples", "sum_dec", "min_dec", "max_dec", "wsum")
  }

  /** DuckDB twin: the same clip/bias/segment/mantissa integer algebra
    * applied to the synthesized PCM — never a WAV byte. */
  val audioUlawSql: String =
    s"""WITH t AS (
         SELECT doc_id, gs.t,
           ((doc_id % $PxDocMod) * 31 + gs.t * 17) % 65536 - 32768 AS s
         FROM documents, generate_series(0, 1199) gs(t)
         WHERE gs.t < 800 + doc_id % 400),
       q AS (
         SELECT doc_id, t, s,
           LEAST(ABS(s), 32635) + 132 AS m FROM t),
       e AS (
         SELECT doc_id, t, s, m,
           CASE WHEN m >= 16384 THEN 7 WHEN m >= 8192 THEN 6
                WHEN m >= 4096 THEN 5 WHEN m >= 2048 THEN 4
                WHEN m >= 1024 THEN 3 WHEN m >= 512 THEN 2
                WHEN m >= 256 THEN 1 ELSE 0 END AS ex FROM q),
       d AS (
         SELECT doc_id, t,
           (CASE WHEN s < 0 THEN -1 ELSE 1 END) *
             ((((m >> (ex + 3)) & 15) * 8 + 132) * (1 << ex) - 132) AS dec
         FROM e)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
              CAST(sum(dec) AS BIGINT) AS sum_dec,
              CAST(min(dec) AS INT) AS min_dec,
              CAST(max(dec) AS INT) AS max_dec,
              CAST(sum((t + 1) * dec) AS BIGINT) AS wsum
       FROM d GROUP BY doc_id"""

  /** Near-dup verdict bound for 128-bit audio fingerprints (as
    * [[HammingMax]] is for image dHash): energy-delta bits are
    * robust to amplitude scaling and mu-law requantization, so a
    * handful of flipped bits still means "same recording". */
  val AudioHammingMax = 6

  /** 128-bit AUDIO FINGERPRINT of a binary audio column — the dHash
    * idea applied to sound: container-sniff (fLaC magic, else
    * RIFF/PCM, else RIFF/mu-law), decode to 16-bit samples ONCE,
    * split the clip into 129 equal windows, sum |sample| per window,
    * and emit bit w = (energy(w+1) > energy(w)) — the ENERGY-DELTA
    * SIGN sequence, invariant under volume scaling and robust to the
    * small per-sample error a lossy mu-law pass introduces (windowed
    * sums smooth it; a flipped bit needs the window ORDERING to
    * change). Output: (doc_id, fp_lo BIGINT, fp_hi BIGINT) — the same
    * banded-Hamming shape as the image perceptual hash, so the whole
    * LSH/cluster/index machinery is shared, and at 100 TB the decode
    * runs exactly once per clip with the index carrying 3 columns.
    * Undecodable payloads fail LOUDLY (the strict-ingest contract:
    * silent drops corrupt the corpus census). */
  def audioFingerprintOf(assets: DataFrame, idCol: Column,
      payloadCol: Column): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.select(idCol.cast("long").as("doc_id"),
      payloadCol.as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (d, payload) =>
          val samples: Array[Short] =
            if (payload.length >= 4 && payload(0) == 'f' &&
                payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C')
              FlacCodec.decode(payload).getOrElse(throw
                new IllegalStateException(s"bad FLAC for doc $d"))._1
            else PixelCodec.decodeWav(payload).map(_._1)
              .orElse(PixelCodec.decodeWavUlaw(payload).map(_._1))
              .getOrElse(throw new IllegalStateException(
                s"unsniffable audio payload for doc $d"))
          val n = samples.length
          require(n >= 129, s"doc $d: clip too short to fingerprint ($n)")
          val e = new Array[Long](129)
          var w = 0
          while (w < 129) {
            val from = (w.toLong * n / 129).toInt
            val to = ((w + 1).toLong * n / 129).toInt
            var s2 = 0L
            var i = from
            while (i < to) { s2 += math.abs(samples(i).toInt); i += 1 }
            e(w) = s2
            w += 1
          }
          var lo = 0L; var hi = 0L
          var b = 0
          while (b < 128) {
            if (e(b + 1) > e(b)) {
              if (b < 64) lo |= 1L << b else hi |= 1L << (b - 64)
            }
            b += 1
          }
          (d, lo, hi)
        }
      }.toDF("doc_id", "fp_lo", "fp_hi")
  }

  /** Per-frame perceptual-hash SET of a binary VIDEO column (APNG
    * container — the multi-frame format this engine's codec family
    * carries): decode the frames ONCE, grey + 9x8 box-average + dHash
    * each, fold to a sorted distinct array of non-negative 31-bit
    * frame-hash values. Output (doc_id, th) — EXACTLY the contract
    * the text LSH machinery runs on, so video near-dup is Jaccard
    * over frame-hash sets: robust to trims, re-muxes, frame
    * reordering and duplicated frames (sets, not sequences); pixel
    * jitter within a frame is the per-frame dHash's job to absorb.
    * Undecodable payloads fail LOUDLY (strict-ingest contract). */
  def videoFrameHashesOf(assets: DataFrame, idCol: Column,
      payloadCol: Column): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.select(idCol.cast("long").as("doc_id"),
      payloadCol.as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (d, payload) =>
          val frames = PixelCodec.decodeApng(payload).getOrElse(
            throw new IllegalStateException(
              s"undecodable video payload for doc $d"))
          val hs = frames.map { f =>
            require(f.width >= 9 && f.height >= 8,
              s"doc $d: frame too small to hash (${f.width}x${f.height})")
            val g = PixelCodec.resizeArea(PixelCodec.toGray(f), 9, 8)
            val (dl, dh) = PixelCodec.dHash(g)
            (dh * 1000003L + dl) & 0x7fffffffL
          }.distinct.sorted.toArray
          (d, hs)
        }
      }.toDF("doc_id", "th")
  }

  /** Audio container DISPATCH under the gate: each doc's synthesized
    * PCM ships in one of THREE real containers by `doc_id % 3` —
    * WAV/PCM (0), WAV/mu-law (1, format tag 7), FLAC (2) — and the
    * decode side sniffs bytes (RIFF magic + format tag, fLaC magic)
    * with NO access to the modulus: the mixed-container corpus shape,
    * like the PNG/BMP/GIF/JPEG pixel sniff. The rollup covers the
    * DECODED samples, so the oracle is the synthesis formula for the
    * lossless containers and the G.711 quantize algebra for mu-law —
    * one query proving dispatch + three codecs end-to-end. */
  def audioSniff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (800 + d % 400).toInt
          val samples = Array.tabulate(n)(t =>
            (((d % PxDocMod) * 31 + t * 17) % 65536 - 32768).toShort)
          val payload = (d % 3) match {
            case 0 => PixelCodec.encodeWav(samples, AudioRate)
            case 1 => PixelCodec.encodeWavUlaw(samples, AudioRate)
            case _ => FlacCodec.encode(samples, AudioRate, 1)
          }
          // sniff: FLAC magic, else RIFF with the format tag deciding
          val (dec, fmt) =
            if (payload.length >= 4 && payload(0) == 'f' &&
                payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C')
              (FlacCodec.decode(payload).get._1, "flac")
            else PixelCodec.decodeWav(payload).map((_: (Array[Short], Int))._1 -> "wav")
              .orElse(PixelCodec.decodeWavUlaw(payload)
                .map((_: (Array[Short], Int))._1 -> "ulaw"))
              .getOrElse(throw new IllegalStateException(
                s"unsniffable audio for doc $d"))
          require(dec.length == n, s"decode shape drifted for doc $d")
          var sum = 0L; var wsum = 0L
          var t = 0
          while (t < n) {
            val v = dec(t).toInt
            sum += v; wsum += (t + 1L) * v; t += 1
          }
          (d, fmt, n.toLong, sum, wsum)
        }
      }.toDF("doc_id", "format", "n_samples", "sum_dec", "wsum")
  }

  /** Oracle: synthesis for wav/flac (lossless), the mu-law integer
    * algebra for ulaw — format derived from the same modulus. */
  val audioSniffSql: String =
    s"""WITH t AS (
         SELECT doc_id, gs.t,
           ((doc_id % $PxDocMod) * 31 + gs.t * 17) % 65536 - 32768 AS s
         FROM documents, generate_series(0, 1199) gs(t)
         WHERE gs.t < 800 + doc_id % 400),
       q AS (
         SELECT doc_id, t, s, LEAST(ABS(s), 32635) + 132 AS m FROM t),
       e AS (
         SELECT doc_id, t, s, m,
           CASE WHEN m >= 16384 THEN 7 WHEN m >= 8192 THEN 6
                WHEN m >= 4096 THEN 5 WHEN m >= 2048 THEN 4
                WHEN m >= 1024 THEN 3 WHEN m >= 512 THEN 2
                WHEN m >= 256 THEN 1 ELSE 0 END AS ex FROM q),
       d AS (
         SELECT doc_id, t,
           CASE WHEN doc_id % 3 = 1 THEN
             (CASE WHEN s < 0 THEN -1 ELSE 1 END) *
               ((((m >> (ex + 3)) & 15) * 8 + 132) * (1 << ex) - 132)
           ELSE s END AS dec
         FROM e)
       SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'wav'
                   WHEN doc_id % 3 = 1 THEN 'ulaw'
                   ELSE 'flac' END AS format,
              CAST(count(*) AS BIGINT) AS n_samples,
              CAST(sum(dec) AS BIGINT) AS sum_dec,
              CAST(sum((t + 1) * dec) AS BIGINT) AS wsum
       FROM d GROUP BY doc_id"""

  // ------------------------------------------- quantized-table spectrogram

  /** DFT frame width and probed bins for [[audioSpectrogram]]. */
  val SpecFrame = 64
  val SpecBins: Seq[Int] = Seq(1, 2, 4, 8)

  /** The cross-engine trick that makes a SPECTRUM hash-gateable:
    * cos/sin are quantized ONCE here (1e6-unit integers) and these
    * literal values feed BOTH the codec loop and the oracle SQL, so
    * no libm call ever runs in either engine -- every DFT sum is
    * exact 64-bit integer arithmetic over identical tables. */
  val SpecCosQ: Array[Long] = Array.tabulate(SpecFrame)(j =>
    math.round(math.cos(2 * math.Pi * j / SpecFrame) * 1e6))
  val SpecSinQ: Array[Long] = Array.tabulate(SpecFrame)(j =>
    math.round(math.sin(2 * math.Pi * j / SpecFrame) * 1e6))

  case class SpectralSums(doc_id: Long, frame_idx: Int, bin: Int,
      re_q: Long, im_q: Long)

  /** Exact-integer DFT sums of every full [[SpecFrame]]-wide frame of
    * `samples` at each probed bin -- the codec-loop core, factored
    * out so specs can feed planted tones directly. */
  private[graft] def frameSpectralSums(d: Long,
      samples: Array[Short]): Seq[SpectralSums] = {
    val nf = samples.length / SpecFrame
    for {
      f <- 0 until nf
      k <- SpecBins
    } yield {
      var re = 0L; var im = 0L
      var j = 0
      while (j < SpecFrame) {
        val v = samples(f * SpecFrame + j).toLong
        val idx = (k * j) % SpecFrame
        re += v * SpecCosQ(idx)
        im -= v * SpecSinQ(idx)
        j += 1
      }
      SpectralSums(d, f, k, re, im)
    }
  }

  /** Audio spectrogram over the real WAV path: PCM synthesis -> WAV
    * bytes -> chunk-walk decode -> per-frame quantized-table DFT at
    * [[SpecBins]] -> per-(doc, bin) spectral power rollup.
    *
    * Output (doc_id, bin, n_frames, power_sum): power_sum =
    * sum over frames of re^2 + im^2 where re/im are the exact
    * integer correlations of the frame against the quantized basis
    * (values up to ~2e15 per frame sum; squares up to ~1e31, so the
    * squaring and rollup run in Catalyst DECIMAL(38,0) -- exact, no
    * doubles anywhere).
    *
    * Split of labor is the multimodal pattern: the BYTE CODEC and
    * the O(frames * bins * width) inner product live in the typed
    * mapPartitions loop (the documented codec exception -- a tight
    * primitive-long loop no Expression matches), while everything
    * row-shaped after it -- squaring, per-(doc, bin) aggregation --
    * is declarative and map-side combinable. At 100 TB the codec
    * stage is embarrassingly per-row with one frame buffer of state;
    * the only shuffle is the final (doc, bin) rollup, combinable on
    * every map side.
    *
    * This is the internal power_sum form; the SHIPPED gate is
    * [[audioSpectrogram]], which re-emits power_sum as exact hi/lo
    * BIGINT words — see the r14 saga note on [[powerToWords]]. */
  def audioSpectrogramPower(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { d =>
          val n = (800 + d % 400).toInt
          val samples = Array.tabulate(n)(t =>
            (((d % PxDocMod) * 31 + t * 17) % 65536 - 32768).toShort)
          (d, PixelCodec.encodeWav(samples, AudioRate))
        }
      }.toDF("doc_id", "payload")
    val sums = assets.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (d, payload) =>
        val (samples, _) = PixelCodec.decodeWav(payload).get
        frameSpectralSums(d, samples)
      }
    }.toDF()
    val dec = (c: Column) => c.cast("decimal(38,0)")
    sums.groupBy(col("doc_id"), col("bin"))
      .agg(count(lit(1)).cast("int").as("n_frames"),
        sum(dec(col("re_q")) * col("re_q") + dec(col("im_q")) * col("im_q"))
          .cast("decimal(38,0)").as("power_sum"))
  }

  /** Re-emit a `(doc_id, bin, n_frames, power_sum DECIMAL(38,0))`
    * spectral rollup as `(doc_id, bin, n_frames, p_hi, p_lo)` — the
    * exact base-1e18 word decomposition `power_sum = p_hi * 1e18 +
    * p_lo`, both plain BIGINT.
    *
    * Why the gates ship THIS shape and never the decimal: the r14
    * board proved the values bit-exact on the driver box (the words
    * sibling gate was GREEN while both DECIMAL(38,0)-emitting
    * variants of the identical computation were red) — a
    * DECIMAL(38,0)/HUGEINT rendering artifact on the compare side,
    * not a data difference. The durable rule that fell out of the
    * three-round saga: gate output columns are BIGINT/INT/STRING/DATE
    * only; >63-bit accumulations travel as hi/lo words. */
  def powerToWords(base: DataFrame): DataFrame = {
    val p = lit(new java.math.BigDecimal("1000000000000000000"))
    val lo = col("power_sum") % p
    base.select(col("doc_id"), col("bin"), col("n_frames"),
      lo.cast("long").as("p_lo"),
      ((col("power_sum") - lo) / p).cast("long").as("p_hi"))
  }

  /** The shipped spectrogram gate: [[audioSpectrogramPower]]'s rollup
    * in the hi/lo word representation (see [[powerToWords]]). */
  def audioSpectrogram(s: SparkSession, dir: String): DataFrame =
    powerToWords(audioSpectrogramPower(s, dir))

  /** DuckDB twin: regenerates the closed-form samples, reads the SAME
    * quantized tables as a plain `(idx, cos_q, sin_q)` VALUES relation
    * joined on the computed basis index, squares in HUGEINT. A hash
    * match proves the whole loop -- WAV encode, chunk-walk decode,
    * framing, the integer DFT, and the decimal rollup --
    * byte-for-byte against an engine that never saw the WAV. (An
    * earlier formulation indexed literal LIST values, whose 1-based
    * indexing/typing semantics have shifted across DuckDB releases —
    * a relational join is the version-stable spelling, and BIGINT
    * casts pin the multiply width explicitly. The same discipline
    * now applies to the frame index and the series join: `//`
    * integer division and the implicit-lateral comma join are
    * DuckDB-dialect spellings whose behavior is the engine's call —
    * `CAST(floor(x / k.0) AS BIGINT)` over the non-negative sample
    * index and an explicit CROSS JOIN are exact and portable across
    * releases.) */
  val audioSpectrogramSql: String = {
    val basisRows = (0 until SpecFrame)
      .map(i => s"($i, ${SpecCosQ(i)}, ${SpecSinQ(i)})").mkString(", ")
    val binList = SpecBins.mkString("(", "), (", ")")
    s"""WITH q AS (
         SELECT idx, CAST(cos_q AS BIGINT) AS cos_q,
                CAST(sin_q AS BIGINT) AS sin_q
         FROM (VALUES $basisRows) v(idx, cos_q, sin_q)),
       t AS (
         SELECT doc_id, gs.t,
           ((doc_id % $PxDocMod) * 31 + gs.t * 17) % 65536 - 32768 AS s
         FROM documents CROSS JOIN generate_series(0, 1199) gs(t)
         WHERE gs.t < 800 + doc_id % 400),
       n AS (SELECT doc_id, count(*) AS ns FROM t GROUP BY doc_id),
       fr AS (
         SELECT t.doc_id,
           CAST(floor(t.t / $SpecFrame.0) AS BIGINT) AS f,
           t.t % $SpecFrame AS j, t.s
         FROM t JOIN n ON t.doc_id = n.doc_id
         WHERE t.t < n.ns - n.ns % $SpecFrame),
       b AS (
         SELECT fr.doc_id, fr.f, bins.k,
           SUM(CAST(fr.s AS BIGINT) * q.cos_q) AS re,
           -SUM(CAST(fr.s AS BIGINT) * q.sin_q) AS im
         FROM fr
         CROSS JOIN (VALUES $binList) bins(k)
         JOIN q ON q.idx = (bins.k * fr.j) % $SpecFrame
         GROUP BY fr.doc_id, fr.f, bins.k)
       SELECT doc_id, CAST(k AS INT) AS bin,
         CAST(count(*) AS INT) AS n_frames,
         CAST(SUM(CAST(re AS HUGEINT) * re + CAST(im AS HUGEINT) * im)
           AS DECIMAL(38,0)) AS power_sum
       FROM b GROUP BY doc_id, k"""
  }

  /** [[audioSpectrogramSql]] wrapped into the hi/lo BIGINT word
    * representation — the oracle text of every shipped spectrogram
    * gate (the decomposition runs in HUGEINT, exact; only two plain
    * BIGINTs ever cross the compare boundary). Byte-identical to the
    * wrapper the driver-green words sibling carried in r14. */
  val audioSpectrogramWordsSql: String = {
    val p = "1000000000000000000"
    s"""WITH base AS ($audioSpectrogramSql)
       SELECT doc_id, bin, n_frames,
         CAST(CAST(power_sum AS HUGEINT) % $p AS BIGINT) AS p_lo,
         CAST(round((CAST(power_sum AS HUGEINT)
             - CAST(power_sum AS HUGEINT) % $p) / $p.0, 0)
           AS BIGINT) AS p_hi
       FROM base"""
  }
}
