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

  /** Deterministic STUB for the codec boundary: derives fake
    * dimensions from payload length only. A real build replaces the
    * body with e.g. JPEG/PNG header parsing. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
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
