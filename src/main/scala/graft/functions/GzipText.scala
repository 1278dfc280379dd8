package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GZIP compress/decompress for text columns — the ingest surface a
  * real 100 TB corpus needs: web-scale text overwhelmingly arrives as
  * gzip'd JSONL payloads, and decompression belongs INSIDE
  * whole-stage codegen next to the parse, not in a Scala UDF that
  * breaks the stage (same reasoning as [[NormText]]). Both directions
  * are one static JVM call over `java.util.zip` (RFC 1952 framing
  * over DEFLATE; the JDK writes a zeroed MTIME, so compression is
  * deterministic for a given input).
  *
  * Registered for SQL as `graft_gzip` / `graft_gunzip`. Decompress is
  * STRICT: corrupt or non-gzip bytes fail the task loudly (a silent
  * null would drop corpus documents without a trace — the loud-fail
  * contract every codec here follows). The text_gzip_roundtrip gate
  * proves decompress∘compress == identity over the whole documents
  * table against an oracle that only ever sees the plain text.
  */
object GzipText {

  def gzipText(text: Column): Column =
    ColumnBridge.column(GzipCompress(ColumnBridge.expression(text)))

  def gunzipText(bytes: Column): Column =
    ColumnBridge.column(GzipDecompress(ColumnBridge.expression(bytes)))

  /** Static codegen target: UTF-8 bytes -> gzip frame. */
  def compress(s: UTF8String): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bo)
    gz.write(s.getBytes)
    gz.close()
    bo.toByteArray
  }

  /** Static codegen target: gzip frame -> UTF-8 string. Throws on
    * corrupt input (see the strictness note above). */
  def decompress(b: Array[Byte]): UTF8String = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    val bo = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bo.write(buf, 0, n); n = in.read(buf) }
    in.close()
    UTF8String.fromBytes(bo.toByteArray)
  }
}

/** See [[GzipText]]. */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gzip"

  override def nullSafeEval(t: Any): Any =
    GzipText.compress(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GzipText.compress($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[GzipText]]. */
case class GzipDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_gunzip"

  override def nullSafeEval(t: Any): Any =
    GzipText.decompress(t.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GzipText.decompress($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
