package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** [[MinHashSigExpr]] with the UNICODE tokenization fused in: lowercase →
  * split on non-letter/non-number runs → shingle → poly-hash → k
  * permutation minima, one native pass with no intermediate arrays and
  * no materialized normalized string.
  *
  * Semantics are EXACTLY `MinHashSigExpr(Text.normalizeForDedup(c), k, n)`
  * — the near-dup family's canonical chain — with the normalize
  * round-trip (regex split → array → concat_ws → re-split) eliminated:
  *  - lowering is `UTF8String.toLowerCase`, the same call `lower()`
  *    compiles to;
  *  - a token is a maximal run of code points in Unicode categories L*
  *    (`Character.isLetter`) or N* (Nd/Nl/No via `Character.getType`) —
  *    the exact class `[^\p{L}\p{N}]+` splits on in Java regex (and RE2,
  *    which is what keeps the DuckDB oracles engine-identical); empties
  *    drop, so leading/trailing separators are irrelevant, matching
  *    `filter(split(...), len > 0)`;
  *  - the shingle arithmetic is [[MinHashSigExpr.signatureFromTokens]]
  *    verbatim (shared code, not a copy).
  * The equivalence is property-tested against the composed Column chain
  * over generated Unicode text (MinHashSigSpec).
  *
  * This is the scale shape for near-dup at 100 TB: tokenization cost is
  * one linear scan fused into the signature pass, instead of a regex
  * split materializing a token array plus a full normalized copy of the
  * corpus' text through the row buffer.
  */
case class UnicodeMinHashSigExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeMinHashSigExpr.signature(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeMinHashSigExpr.signature($c, $k, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeMinHashSigExpr =
    copy(child = newChild)
}

object UnicodeMinHashSigExpr {

  /** Unicode L* or N* (the `\p{L}\p{N}` class): letters via isLetter
    * (Lu/Ll/Lt/Lm/Lo), numbers via the three N category codes. */
  private def isTokenCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  /** Maximal `\p{L}\p{N}` runs of an (already lowered) string — exposed
    * for the property test that pins scanner ≡ Java-regex split. */
  private[graft] def tokenize(
      str: String): scala.collection.mutable.ArrayBuffer[String] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var start = -1 // -1 = not inside a token
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isTokenCp(cp)) { if (start < 0) start = i }
      else if (start >= 0) { toks += str.substring(start, i); start = -1 }
      i += Character.charCount(cp)
    }
    if (start >= 0) toks += str.substring(start)
    toks
  }

  def signature(s: UTF8String, k: Int, n: Int): ArrayData =
    MinHashSigExpr.signatureFromTokens(
      tokenize(s.toLowerCase.toString), k, n) // lower() compiles to this call

  def apply(c: Column, k: Int = 64, n: Int = 3): Column =
    GraftColumnBridge.column(
      UnicodeMinHashSigExpr(GraftColumnBridge.expression(c), k, n))
}
