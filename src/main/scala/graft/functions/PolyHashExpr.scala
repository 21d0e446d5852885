package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial hash
  * fold(h·31 + codepoint) mod 1e9+7 — semantically identical to the
  * DuckDB-mirrored SQL form (`list_reduce` over `unicode()` code points)
  * but a tight JVM loop with whole-stage codegen instead of a per-character
  * interpreted lambda chain.
  *
  * Why it exists: minhash evaluates the base hash inside k=64 permutation
  * branches; Catalyst's CollapseProject re-inlines a shared projection into
  * every branch, which turned the HOF formulation into a measured ~500×
  * regression at sf0.1. Making the leaf cheap beats fighting the optimizer.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  final val P = 1000000007L

  /** Code-point iteration (matches DuckDB `unicode()` per character; for
    * the ASCII corpora this equals the byte value). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(PolyHashExpr(GraftColumnBridge.expression(c)))
}
