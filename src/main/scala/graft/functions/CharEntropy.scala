package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass character-distribution statistics.
  *
  * The HOF formulation (split -> array_sort -> per-element struct
  * fold) allocates a UTF8String per character and an accumulator
  * struct per step, evaluated interpreted outside whole-stage codegen
  * -- measured ~1.5 us/char, the dominant cost of the text_entropy
  * op at every sweep scale. This expression walks the string's
  * codepoints once into a small open-addressing count table
  * (charset-bounded) and folds the quantized log terms directly:
  * O(len) per row, one tight JVM loop, zero per-char allocation.
  *
  * Exactness: term quantization mirrors the Spark-expression path
  * byte for byte -- `BigDecimal.valueOf(x).setScale(0, HALF_UP)` IS
  * what Spark's `round(x, 0)` generates for doubles -- and the term
  * sum is an integer, so accumulation order (hash-table slot order
  * here, char order in the oracle) cannot change the result.
  */
object CharEntropy {

  /** struct(n_chars, n_charset, sum_u) over a text column; sum_u is
    * the 1e-6-quantized integer sum of cnt * log(n/cnt) terms
    * (divide by n * 1e6 for entropy in nats). */
  def stats(text: Column): Column =
    ColumnBridge.column(CharEntropyStats(ColumnBridge.expression(text)))

  private def roundHalfUpSparkStyle(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** One pass; called from both eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // Java split("") on an empty string yields [""], one empty token:
    // preserve the historical split-based engine behavior (n=1, one
    // "distinct char", zero entropy) so the rewrite is value-identical
    // on BMP input. Non-BMP text diverges BY DESIGN: this walk counts
    // CODEPOINTS (an emoji is one char), where split("") counted
    // UTF-16 code units (a surrogate pair as two) -- the codepoint
    // semantics also match the DuckDB oracle's length()/string_split;
    // ArrayExprsSpec pins a surrogate-pair case
    if (str.isEmpty)
      return new GenericInternalRow(Array[Any](1L, 1L, 0L))
    var cap = 128
    var keys = new Array[Int](cap)
    var cnts = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1)
    var filled = 0
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      // linear probe; grow at 3/4 load so the walk stays O(1)
      var slot = (cp * 0x9E3779B9) >>> (32 - Integer.numberOfTrailingZeros(cap))
      while (keys(slot) != -1 && keys(slot) != cp)
        slot = (slot + 1) & (cap - 1)
      if (keys(slot) == -1) {
        keys(slot) = cp; filled += 1
        if (filled * 4 > cap * 3) {
          val ok = keys; val oc = cnts
          cap *= 2
          keys = new Array[Int](cap); cnts = new Array[Long](cap)
          java.util.Arrays.fill(keys, -1)
          var j = 0
          while (j < ok.length) {
            if (ok(j) != -1) {
              var s2 = (ok(j) * 0x9E3779B9) >>>
                (32 - Integer.numberOfTrailingZeros(cap))
              while (keys(s2) != -1) s2 = (s2 + 1) & (cap - 1)
              keys(s2) = ok(j); cnts(s2) = oc(j)
            }
            j += 1
          }
          // cp was inserted before the growth check, so the migration
          // loop has already carried it into the new table -- just
          // re-locate its slot for the count bump below
          slot = (cp * 0x9E3779B9) >>> (32 - Integer.numberOfTrailingZeros(cap))
          while (keys(slot) != cp)
            slot = (slot + 1) & (cap - 1)
        }
      }
      cnts(slot) += 1
    }
    var sumU = 0L
    var kinds = 0L
    var j = 0
    while (j < cap) {
      if (keys(j) != -1) {
        val c = cnts(j)
        sumU += c * roundHalfUpSparkStyle(math.log(n.toDouble / c) * 1e6)
        kinds += 1
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](n, kinds, sumU))
  }
}

/** See [[CharEntropy]]. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_charset", LongType, nullable = false),
    StructField("sum_u", LongType, nullable = false)))
  override def prettyName: String = "graft_char_entropy_stats"

  override def nullSafeEval(t: Any): Any =
    CharEntropy.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharEntropy.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
