package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing expressions for the dedup hot path.
  *
  * The declarative forms ([[graft.ops.Hashing.minhashSig]] as K
  * `transform`+`array_min` HOFs, shingle hashing as a `transform`
  * whose lambda re-evaluates an md5/conv expression subtree per
  * element) run INTERPRETED per array element -- measured as the
  * dominant cost of the LSH dedup operators (the projection outweighs
  * the pair join). These expressions compute the identical values in
  * one tight JVM pass per row; the generated code calls the static
  * helpers below, so the projection stays inside WholeStageCodegen
  * with one method call per row.
  *
  * Hash math is pinned to the cross-engine md5 bridge
  * ([[graft.ops.Hashing]]): h15(s) = first 15 hex digits of md5(s)
  * parsed base-16 = (first 8 digest bytes as big-endian u64) >>> 4.
  */
object HashExprs {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** h15 of raw UTF-8 bytes -- bit-identical to
    * `conv(substring(md5(s),1,15),16,10)` and DuckDB's
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`. */
  def h15Utf8(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Sorted distinct 31-bit shingle-hash set over a token array:
    * for i in 1..max(len-(n-1),1), shingle_i = tokens[i..i+n) (clamped
    * at the end, exactly like `slice`), hashed h15&0x7FFFFFFF.
    * Static helper invoked from generated code. */
  def shingleSet(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, len)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens.getUTF8String(j).toString)
        j += 1
      }
      out(i) = h15Utf8(UTF8String.fromString(sb.toString)) & 0x7FFFFFFFL
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place distinct over the sorted hashes
    var w = 0
    var r = 0
    while (r < count) {
      if (r == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == count) out else java.util.Arrays.copyOf(out, w))
  }

  /** One-pass minhash signature: sig(i) = min over elements h of
    * (a_i*h + b_i) mod (2^61-1), identical to the K-HOF form. Empty
    * input yields an all-null signature (array_min of empty = null).
    * Static helper invoked from generated code. */
  def minhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val p = graft.ops.Hashing.MersenneP
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * HashExprs.permACache(j) + HashExprs.permBCache(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // permA/permB are pure functions of the index; cache enough for any
  // signature width the engine uses (k <= 64)
  private val permACache: Array[Long] = Array.tabulate(64)(graft.ops.Hashing.permA)
  private val permBCache: Array[Long] = Array.tabulate(64)(graft.ops.Hashing.permB)

  /** array<string> tokens -> sorted distinct array<long> of 31-bit
    * md5 shingle hashes (n=1 = the hashed token set). */
  case class Md5ShingleSet(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_set"

    override def nullSafeEval(a: Any): Any =
      shingleSet(a.asInstanceOf[ArrayData], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashExprs.shingleSet($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** array<long> 31-bit hashes -> array<long> minhash signature of
    * width k (null elements iff the input is empty). */
  case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0 && k <= 64, s"signature width $k outside the cached perm family")
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "graft_minhash_sig"

    override def nullSafeEval(a: Any): Any =
      minhashSignature(a.asInstanceOf[ArrayData], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashExprs.minhashSignature($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------- Column sugar

  def md5ShingleSet(tokens: Column, n: Int): Column =
    ColumnBridge.column(Md5ShingleSet(ColumnBridge.expression(tokens), n))

  def minhashSig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(hashes), k))
}
