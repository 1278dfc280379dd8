package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass second-moment accumulator over a vector column -- the
  * distributed half of PCA: count, per-dimension sums, and the
  * upper-triangle outer-product sums, all in EXACT integer arithmetic
  * on a fixed quantization grid (inputs snapped to 1e-3 like the
  * centroid ops' 1e-6 sums; products are grid-int * grid-int), so the
  * result is independent of partitioning, merge order, and cluster
  * size -- a double-accumulating covariance would drift with Spark's
  * shuffle layout AND disagree with any cross-engine oracle.
  *
  * State: 1 + d + d(d+1)/2 longs (d = 64 -> 2145 longs ~ 17 KB), a
  * TypedImperativeAggregate so Spark plans partial+final
  * ObjectHashAggregate: every task folds its rows locally and ships
  * ONE buffer -- a 100 TB covariance costs a scan plus d^2 longs per
  * task, nothing row-shaped ever shuffles.
  *
  * Overflow headroom: |q| <= Q * max|x|; at max|x| ~ 10 the product
  * is <= 1e8, so ~9e10 rows fit in the Long product sums -- beyond
  * any corpus this engine targets per group.
  *
  * Output: struct(n, sums: array<long>, prods: array<long>
  * upper-triangle row-major -- (i,j>=i) at index i*d - i(i-1)/2 +
  * (j-i)).
  */
case class VecOuterSum(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecOuterSum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  // registered for SQL (graft_vec_outer_sum), so the input contract
  // must be CHECKED, not assumed: an array<double> read through
  // getFloat would silently produce garbage moments. Accept float or
  // double element types and dispatch the read accordingly.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, " +
        s"got ${other.catalogString}")
  }

  private lazy val readsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("prods", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_vec_outer_sum"

  override def createAggregationBuffer(): VecOuterSum.Buf =
    new VecOuterSum.Buf(d)

  override def update(buf: VecOuterSum.Buf, input: InternalRow): VecOuterSum.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // ragged or null-holed vectors fail LOUD: silently skipping
      // them would compute moments over an unannounced subset (a
      // NULL vector row still skips -- standard aggregate semantics)
      if (arr.numElements() != d)
        throw new IllegalArgumentException(
          s"$prettyName: vector length ${arr.numElements()} != d=$d")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"$prettyName: null element at index $i (d=$d)")
        val x = if (readsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = VecOuterSum.quantize(x)
        i += 1
      }
      buf.n += 1
      i = 0
      var t = 0
      while (i < d) {
        buf.sums(i) += q(i)
        var j = i
        while (j < d) {
          buf.prods(t) += q(i) * q(j)
          j += 1; t += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecOuterSum.Buf, other: VecOuterSum.Buf): VecOuterSum.Buf = {
    buf.n += other.n
    var i = 0
    while (i < d) { buf.sums(i) += other.sums(i); i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) += other.prods(i); i += 1 }
    buf
  }

  override def eval(buf: VecOuterSum.Buf): Any =
    InternalRow(buf.n, new GenericArrayData(buf.sums),
      new GenericArrayData(buf.prods))

  override def serialize(buf: VecOuterSum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    buf.sums.foreach(out.writeLong)
    buf.prods.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecOuterSum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecOuterSum.Buf(d)
    buf.n = in.readLong()
    var i = 0
    while (i < d) { buf.sums(i) = in.readLong(); i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VecOuterSum {
  /** Input quantization grid: 1e-3 units. */
  val Quantum = 1000.0

  /** BINARY round-half-away-from-zero of `x * 1000` -- the exact twin
    * of DuckDB `round(CAST(x AS DOUBLE) * 1000)`, which rounds the
    * IEEE double itself. Two determinism obligations meet here: (1)
    * the oracle must CAST to DOUBLE before multiplying (float*1000 in
    * float arithmetic lands a different double for values near the
    * rounding boundary -- the actual r9 emb_pca_cov divergence); (2)
    * rounding must be on the binary value, not a decimal-string
    * (equivalent at integer scale where ties are exactly
    * representable, but only the binary form generalizes). The tie
    * test `v - floor(v) == 0.5` is exact: for |v| < 2^52 the
    * difference of a double and its floor is exactly representable. */
  def quantize(x: Double): Long = {
    val v = x * Quantum
    val f = math.floor(v)
    val diff = v - f
    if (diff > 0.5) f.toLong + 1
    else if (diff < 0.5) f.toLong
    else if (v >= 0.0) f.toLong + 1 // exact tie: away from zero
    else f.toLong
  }

  final class Buf(d: Int) {
    var n: Long = 0L
    val sums: Array[Long] = new Array[Long](d)
    val prods: Array[Long] = new Array[Long](d * (d + 1) / 2)
  }

  /** struct(n, sums, prods) over an array<float> / array<double>
    * column. */
  def agg(vec: Column, d: Int): Column =
    ColumnBridge.column(
      VecOuterSum(ColumnBridge.expression(vec), d).toAggregateExpression())
}
