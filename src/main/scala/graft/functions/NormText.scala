package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for the tokenization layer: NFKC
  * compatibility normalization + ROOT-locale lowercasing in one
  * codegen'd pass.
  *
  * NFKC folds the look-alike variants real web text is full of --
  * fullwidth forms (Ｆｕｌｌ -> Full), typographic ligatures
  * (ﬁ -> fi), compatibility symbols -- so fingerprints and shingles
  * built on normalized tokens catch near-dups that differ only in
  * encoding form. Spark has no built-in Unicode-normalize function
  * and a Scala UDF would leave whole-stage codegen, so this is a
  * native expression (same pattern as [[CharEntropy]]): the generated
  * code calls one static JVM method, O(len) per row.
  *
  * The fast path skips allocation entirely for pure-ASCII input that
  * is already lowercase -- NFKC is the identity on ASCII, so the only
  * work is the case check.
  */
object NormText {

  /** NFKC + lowercase of a string column. */
  def nfkcLower(text: Column): Column =
    ColumnBridge.column(NfkcLower(ColumnBridge.expression(text)))

  /** One pass; called from both eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII-and-lowercase fast path: return the input buffer untouched
    val nb = s.numBytes()
    var i = 0
    var clean = true
    while (clean && i < nb) {
      val b = s.getByte(i)
      // negative byte = non-ASCII; 'A'..'Z' needs lowering
      if (b < 0 || (b >= 'A' && b <= 'Z')) clean = false
      i += 1
    }
    if (clean) return s
    val str = s.toString
    val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC)
    UTF8String.fromString(norm.toLowerCase(java.util.Locale.ROOT))
  }
}

/** See [[NormText]]. */
case class NfkcLower(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfkc_lower"

  override def nullSafeEval(t: Any): Any =
    NormText.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NormText.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
