package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for squared L2 distance over two numeric
  * arrays — one fused whole-stage-codegen loop.
  *
  * Arithmetic order is a strictly sequential left fold per component,
  * identical to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0, _+_)` and to the
  * DuckDB oracle's `list_reduce` — results are bit-identical
  * (float→double widening is exact). The HOF chain pays per-element
  * interpreted lambda dispatch (cf. CosineSimExpr's rationale); this is
  * the hot-path replacement used by `operators.PQ`, where the distance is
  * evaluated O(vectors × subspaces × codewords) times during encoding.
  *
  * Same contract as CosineSimExpr: bit-identity for non-null,
  * equal-length inputs; a null element reads as 0.0 where the HOF chain
  * returns null, and unequal lengths fold over the common prefix.
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq requires array<float|double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SqExpr.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.L2SqExpr.l2sq($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {

  /** Fused sequential-fold Σ(x−y)²; `af`/`bf` select float vs double. */
  def l2sq(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2SqExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
