package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the distinct word-n-gram shingle
  * poly-hashes of a text column in ONE pass — the fused replacement for
  * `array_distinct(transform(zip_with-of-slices, polyHash))`.
  *
  * Semantics replicated exactly (bit-for-bit vs the HOF formulation,
  * spec-checked):
  *  - tokens = split on single space, empty tokens preserved (Spark
  *    `split(c, " ")` / DuckDB `string_split` semantics);
  *  - shingle hash = base-31 code-point fold mod 1e9+7 of
  *    `tok(i) ⧺ " " ⧺ … ⧺ tok(i+n−1)` (identical to PolyHashExpr over the
  *    joined string — the space folds in as code point 32);
  *  - distinct keeps first-occurrence order (array_distinct semantics).
  *
  * Why: shingling was the measured dominant minhash cost (~0.6 ms/doc —
  * SCALE.md "known hot spots"); the HOF form allocates 3 slice arrays +
  * n-1 zipped intermediates + a string per shingle and runs interpreted
  * lambdas per element. This walks each token's code points ≤ n times with
  * zero intermediate allocation beyond the hash set.
  */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashExpr.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashExpr.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  import PolyHashExpr.P

  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // split on single space, preserving empty tokens (incl. trailing)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { toks += str.substring(start, i); start = i + 1 }
      i += 1
    }
    toks += str.substring(start)

    val nShingles = toks.length - (n - 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nShingles) {
      var h = 0L
      var t = 0
      while (t < n) {
        val tok = toks(j + t)
        var k = 0
        while (k < tok.length) {
          val cp = tok.codePointAt(k)
          h = (h * 31 + cp) % P
          k += Character.charCount(cp)
        }
        if (t < n - 1) h = (h * 31 + 32) % P
        t += 1
      }
      seen.add(h)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int = 3): Column =
    GraftColumnBridge.column(ShingleHashExpr(GraftColumnBridge.expression(c), n))
}
