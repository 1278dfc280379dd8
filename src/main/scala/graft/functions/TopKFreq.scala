package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate --
  * the custom-aggregate machinery SURVEY.md S7.3 earmarks for sketch
  * operators. Tracks at most `capacity` distinct long items per
  * group; when full, the minimum-count entry is evicted and its count
  * inherited (the SpaceSaving overestimate bound: err <= n/capacity).
  * When `capacity` >= the group's true distinct count the sketch is
  * EXACT, which is how the oracle gate checks it.
  *
  * Scale shape: per-group state is a bounded hash map (16 bytes/slot
  * + overhead), updates are O(1) amortized, partial aggregation
  * (map-side combine) works because sketches merge associatively --
  * exactly the properties a 100 TB heavy-hitters pass needs.
  *
  * Output: array<struct<item:long, cnt:long>> of the top `k` entries,
  * ordered (cnt desc, item asc) -- deterministic under ties.
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))))
  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  private def add(buf: mutable.LongMap[Long], item: Long, count: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + count)
      case None if buf.size < capacity => buf.update(item, count)
      case None =>
        // evict the (deterministic) minimum entry, inherit its count
        var mk = Long.MaxValue; var mv = Long.MaxValue
        buf.foreach { case (key, c) =>
          if (c < mv || (c == mv && key < mk)) { mk = key; mv = c }
        }
        buf.remove(mk)
        buf.update(item, mv + count)
    }
  }

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (item, c) => add(buf, item, c) }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val top = buf.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(item, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => out.writeLong(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKFreq {
  /** Column sugar: top-k frequent longs per group. */
  def topkFreq(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      TopKFreq(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
