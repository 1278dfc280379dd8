package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-set sketch as a
  * TypedImperativeAggregate -- the mergeable sketch family whose set
  * ALGEBRA survives at scale: unlike HLL (union-only), two KMV
  * sketches support intersection / Jaccard estimates, which is what a
  * cross-table "how many keys overlap" diagnostic needs without ever
  * shuffling the raw key sets (Beyer et al., SIGMOD'07 "On synopses
  * for distinct-value estimation under multiset operations").
  *
  * State: the `k` smallest distinct 64-bit hashes seen, stored
  * FLIPPED (`h ^ Long.MinValue`) so signed order equals unsigned
  * order of the raw hash -- downstream SQL can `array_sort` /
  * compare the emitted values directly and the [0,1) uniform mapping
  * is `(flipped + 2^63) / 2^64`. A `saturated` flag records whether
  * anything was ever dropped: while FALSE the sketch holds EVERY
  * distinct hash seen, so set operations on it are exact -- the
  * oracle gate runs in that regime (capacity above the true NDV),
  * the same below-capacity exactness trick as [[TopKFreq]].
  *
  * Scale shape: per-group state is a bounded sorted set (<= k longs),
  * updates are O(log k) with an O(1) reject of any hash above the
  * current k-th minimum once full, merges are associative unions
  * re-trimmed to k -- map-side combine works, and a 100 TB scan
  * reduces to one k-long array per group.
  *
  * Output: struct(mins: array<long> flipped-ascending, saturated:
  * boolean).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("saturated", BooleanType, nullable = false)))
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvSketch.Buf = new KmvSketch.Buf

  private def add(buf: KmvSketch.Buf, raw: Long): Unit = {
    val flipped = raw ^ Long.MinValue
    val set = buf.set
    if (set.size >= k) {
      // full: a hash at or above the current k-th minimum carries no
      // information for the k-min synopsis, but its existence means
      // the sketch no longer holds the full distinct set
      if (flipped >= set.last()) {
        if (!set.contains(flipped)) buf.saturated = true
      } else if (set.add(flipped)) {
        set.remove(set.last())
        buf.saturated = true
      }
    } else set.add(flipped)
    ()
  }

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf = {
    if (other.saturated) buf.saturated = true
    val it = other.set.iterator()
    while (it.hasNext) add(buf, it.next() ^ Long.MinValue)
    buf
  }

  override def eval(buf: KmvSketch.Buf): Any = {
    val arr = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    InternalRow(new GenericArrayData(arr), buf.saturated)
  }

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.saturated)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvSketch.Buf
    buf.saturated = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Bounded sorted buffer of flipped hashes + information-loss flag. */
  final class Buf {
    val set = new java.util.TreeSet[java.lang.Long]()
    var saturated: Boolean = false
  }

  /** Column sugar: KMV sketch of a LONG hash column (callers hash
    * arbitrary keys with xxhash64 first). */
  def kmv(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
