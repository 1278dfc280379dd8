package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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
      if (arr.numElements() == d) {
        val q = new Array[Long](d)
        var i = 0
        while (i < d) {
          q(i) = VecOuterSum.quantize(arr.getFloat(i).toDouble)
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

  /** Spark/DuckDB `round()` semantics (half away from zero) -- the
    * exact twin of `CAST(round(x * 1000) AS BIGINT)` on the oracle
    * side, the CharEntropy quantization discipline. */
  def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * Quantum)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  final class Buf(d: Int) {
    var n: Long = 0L
    val sums: Array[Long] = new Array[Long](d)
    val prods: Array[Long] = new Array[Long](d * (d + 1) / 2)
  }

  /** struct(n, sums, prods) over an array<float> column. */
  def agg(vec: Column, d: Int): Column =
    ColumnBridge.column(
      VecOuterSum(ColumnBridge.expression(vec), d).toAggregateExpression())
}
