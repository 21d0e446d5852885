package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the full k-permutation MinHash
  * signature of a text column in ONE fused pass: tokenize → n-gram
  * shingle → poly-hash → k permutation minima, no intermediate arrays,
  * no explode, no aggregate.
  *
  * This removes the signature-building SHUFFLE entirely: the previous
  * formulation exploded every (doc, shingle) row and ran k codegen'd
  * `min()` aggregates (map-side partials + one hash aggregate exchange);
  * a k-wide Column-level array expression was not an option because
  * CollapseProject re-inlines the shared shingle projection into every
  * array element (a measured 30×+ regression). A single native expression
  * is immune to that — the shingle hash is computed once per shingle in
  * a local variable and feeds all k minima in a tight loop.
  *
  * Bit-identical (spec-checked) to the explode+aggregate form:
  *  - shingle hash: identical to [[ShingleHashExpr]] (base-31 code-point
  *    fold mod P over `tok(i) ⧺ " " ⧺ …`);
  *  - permutation i value: (h · (2i+3) + 7i+1) mod P, h ∈ [0, P) — the
  *    exact arithmetic the DuckDB oracle mirrors (Text.minhashSigSql);
  *  - min over ALL shingles ≡ min over distinct shingles (min ignores
  *    duplicates), so the distinct step drops out;
  *  - docs with fewer than n tokens yield an EMPTY array (the explode
  *    form simply produced no rows for them) — callers filter size > 0.
  */
case class MinHashSigExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.signature(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr.signature($c, $k, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  import PolyHashExpr.P

  def signature(s: UTF8String, k: Int, n: Int): ArrayData = {
    val str = s.toString
    // split on single space, preserving empty tokens (incl. trailing) —
    // identical to ShingleHashExpr / Spark split / DuckDB string_split
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { toks += str.substring(start, i); start = i + 1 }
      i += 1
    }
    toks += str.substring(start)
    signatureFromTokens(toks, k, n)
  }

  /** The shingle → poly-hash → k-minima core over an already-tokenized
    * document — shared by the space-split form above and the fused
    * Unicode-tokenizing form ([[UnicodeMinHashSigExpr]]). Shingle hash =
    * base-31 code-point fold over `tok(j) ⧺ " " ⧺ … ⧺ tok(j+n-1)` mod P,
    * exactly [[Text.polyHashSql]]'s arithmetic. */
  private[functions] def signatureFromTokens(
      toks: scala.collection.mutable.ArrayBuffer[String], k: Int,
      n: Int): ArrayData = {
    val nShingles = toks.length - (n - 1)
    if (nShingles <= 0) return new GenericArrayData(new Array[Long](0))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < nShingles) {
      var h = 0L
      var t = 0
      while (t < n) {
        val tok = toks(j + t)
        var c = 0
        while (c < tok.length) {
          val cp = tok.codePointAt(c)
          h = (h * 31 + cp) % P
          c += Character.charCount(cp)
        }
        if (t < n - 1) h = (h * 31 + 32) % P
        t += 1
      }
      // h < P ≈ 1e9; h·(2k+1) + 7k fits a long with huge margin
      var p = 0
      while (p < k) {
        val v = (h * (2 * p + 3) + 7 * p + 1) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column, k: Int = 64, n: Int = 3): Column =
    GraftColumnBridge.column(MinHashSigExpr(GraftColumnBridge.expression(c), k, n))
}
