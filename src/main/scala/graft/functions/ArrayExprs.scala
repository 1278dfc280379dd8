package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the array-heavy hot paths.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/
  * `array_intersect`) evaluate lambdas interpreted, outside
  * whole-stage codegen -- fine for a projection, ruinous inside a
  * pairwise similarity join executed millions of times. These
  * expressions generate tight Java loops over the primitive
  * `ArrayData`, keeping the whole operator inside WholeStageCodegen.
  *
  * Both have exact DuckDB-oracle twins: [[DoubleDot]] folds strictly
  * left-to-right in double (same order as `list_dot_product`), and
  * [[SortedLongJaccard]] is plain set arithmetic.
  */
object ArrayExprs {

  /** dot(a, b) over array<double>, sequential left-to-right fold.
    * Inputs must be equal-length, null-element-free (engine
    * guarantees: embeddings are dense). */
  case class DoubleDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0d
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    // every local goes through freshName: the same expression can be
    // generated twice into ONE Java method (join condition + output
    // projection), where fixed names collide and Janino falls back to
    // the interpreter for the whole predicate
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Jaccard similarity |A inter B| / |A union B| of two SORTED,
    * DISTINCT array<long> columns via a single merge walk -- O(n+m),
    * no hash sets, no per-element object churn. */
  case class SortedLongJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaccard"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      val m = y.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      val union = n + m - inter
      if (union == 0) 1.0d else inter.toDouble / union
    }

    // freshName on all locals -- see DoubleDot.doGenCode
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter"); val u = ctx.freshName("u")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements(); int $m = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $n && $j < $m) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $inter++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |int $u = $n + $m - $inter;
           |${ev.value} = ($u == 0) ? 1.0 : ((double) $inter) / $u;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Intersection SIZE of two SORTED, DISTINCT array<long> columns
    * via the same merge walk as [[SortedLongJaccard]] -- the numerator
    * containment scoring needs (|A inter B| / min(|A|,|B|), which a
    * symmetric jaccard cannot express). */
  case class SortedLongOverlap(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "graft_overlap"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      val m = y.numElements()
      var i = 0; var j = 0; var inter = 0L
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      inter
    }

    // freshName on all locals -- see DoubleDot.doGenCode
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements(); int $m = $b.numElements();
           |int $i = 0; int $j = 0; long $inter = 0L;
           |while ($i < $n && $j < $m) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $inter++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $inter;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** SimHash fingerprint of a hashed-token array<long>: for each bit
    * j < bits, sum +-1 weights over tokens (bit j of each token hash),
    * set fingerprint bit j iff the sum is positive. One tight nested
    * loop per row instead of a bits-way explode + two shuffled
    * aggregations. */
  case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var fp = 0L
      var j = 0
      while (j < bits) {
        var w = 0; var i = 0
        while (i < n) {
          if (((x.getLong(i) >> j) & 1L) == 1L) w += 1 else w -= 1
          i += 1
        }
        if (w > 0) fp |= (1L << j)
        j += 1
      }
      fp
    }

    // freshName on all locals -- see DoubleDot.doGenCode
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val fp = ctx.freshName("fp")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val w = ctx.freshName("w")
        s"""
           |int $n = $a.numElements();
           |long $fp = 0L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  int $w = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if (((($a.getLong($i)) >> $j) & 1L) == 1L) { $w++; } else { $w--; }
           |  }
           |  if ($w > 0) $fp |= (1L << $j);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------- Column sugar

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedLongJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedLongOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash(a: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(a), bits))
}
