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
}
