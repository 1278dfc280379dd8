package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.ops.PixelCodec

/** Native image expressions: the codec loop as CODEGEN-FRIENDLY
  * scalar functions, so perceptual hashing and container probing run
  * inside whole-stage codegen on a binary column -- no typed Dataset
  * boundary, no mapPartitions, columns stay columnar. Undecodable
  * payloads yield NULL (SQL-idiomatic; callers who need loud failure
  * assert on the null -- [[graft.ops.MultimodalOps.imageDhashOf]]
  * does). Registered for SQL as `graft_image_phash` /
  * `graft_image_dims` (see FunctionRegistration).
  */
object ImageExprs {

  /** Static codegen target: decode (PNG, BMP, GIF, then baseline
    * JPEG — the classic perceptual-hash input) -> grey -> 9x8 box
    * average -> dHash over 9x8 + aHash over the left 8x8 subgrid.
    * Unrecognized bytes: null when lenient, IllegalStateException
    * when strict (the DataFrame API's loud-failure contract). */
  def phash(payload: Array[Byte], strict: Boolean): InternalRow = {
    val decoded = PixelCodec.decodePng(payload)
      .orElse(PixelCodec.decodeBmp(payload))
      .orElse(PixelCodec.decodeGif(payload))
      .orElse(graft.ops.JpegCodec.decodeJpeg(payload))
      // a hash over a 9x8 grid needs at least 9x8 source pixels
      // (resizeArea is downscale-only); smaller images carry too few
      // gradients to hash meaningfully -- unhashable, not an error
      // class of their own
      .filter(img => img.width >= 9 && img.height >= 8)
    decoded match {
      case None =>
        if (strict) throw new IllegalStateException(
          "graft_image_phash: undecodable or sub-9x8 image payload")
        else null
      case Some(img) =>
        val g = PixelCodec.resizeArea(PixelCodec.toGray(img), 9, 8)
        val (dl, dh) = PixelCodec.dHash(g)
        val sub = PixelCodec.Image(8, 8, 1,
          Array.tabulate(64)(j => g.pixels((j / 8) * 9 + j % 8)))
        val (al, ah) = PixelCodec.aHash(sub)
        InternalRow(dl, dh, al, ah)
    }
  }

  /** Static codegen target: container dimensions without a pixel
    * decode for PNG (IHDR carries them); BMP reads its header. Null
    * for unrecognized bytes. */
  def dims(payload: Array[Byte]): InternalRow =
    graft.ops.MultimodalOps.HeaderDecoder.pngDims(payload) match {
      case Some((w, h)) =>
        // channels still need the IHDR color type byte
        val ct = if (payload.length > 25) payload(25) & 0xff else 0
        val ch = ct match { case 0 => 1; case 4 => 2; case 2 => 3
          case 6 => 4; case _ => 0 }
        InternalRow(w, h, ch)
      case None =>
        PixelCodec.decodeBmp(payload).orElse(PixelCodec.decodeGif(payload))
          match {
            case Some(img) =>
              InternalRow(img.width, img.height, img.channels)
            case None => null
          }
    }
}

/** `graft_image_phash(payload)` -> struct(dhash_lo, dhash_hi,
  * ahash_lo, ahash_hi) as positive 32-bit halves, or NULL if the
  * bytes are not a recognized image (SQL registration is lenient;
  * the DataFrame API passes `strict = true` to fail loud instead --
  * one flag so the decode still evaluates ONCE, with no separate
  * assertion operator re-running it). */
case class ImagePhash(child: Expression, strict: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("dhash_lo", LongType, nullable = false),
    StructField("dhash_hi", LongType, nullable = false),
    StructField("ahash_lo", LongType, nullable = false),
    StructField("ahash_hi", LongType, nullable = false)))
  override def prettyName: String = "graft_image_phash"

  override def nullSafeEval(p: Any): Any =
    ImageExprs.phash(p.asInstanceOf[Array[Byte]], strict)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      ${ev.value} = graft.functions.ImageExprs.phash($p, $strict);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_image_dims(payload)` -> struct(width, height, channels), or
  * NULL if the bytes are not a recognized image container. */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))
  override def prettyName: String = "graft_image_dims"

  override def nullSafeEval(p: Any): Any =
    ImageExprs.dims(p.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      ${ev.value} = graft.functions.ImageExprs.dims($p);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
