package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two numeric
  * arrays — a single fused whole-stage-codegen loop computing the dot
  * product and both norms in one pass.
  *
  * Arithmetic order is a strictly sequential left fold per component,
  * identical to the HOF formulation
  * `aggregate(zip_with(a,b,_*_), 0.0, _+_) / (sqrt(Σa²)·sqrt(Σb²))`
  * and to the DuckDB oracle's `list_reduce` — results are bit-identical
  * (float→double widening is exact). The HOF chain is evaluated by
  * Catalyst's interpreter with per-element lambda dispatch (~100× slower;
  * cf. PolyHashExpr's rationale); this is the hot-path replacement used by
  * `operators.Knn` where similarity is evaluated O(candidate pairs) times.
  *
  * Bit-identity holds for non-null, equal-length inputs (what every
  * caller in this engine produces). Divergences outside that contract:
  * a null ELEMENT is read as 0.0 here where the HOF chain returns null,
  * and unequal lengths fold over the common prefix where the HOF (whose
  * zip_with null-pads) returns null.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Only float/double arrays: getFloat/getDouble on any other element
  // type would reinterpret memory, not cast (unlike the HOF formulation).
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
        s"cosine_sim requires array<float|double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** Fused sequential-fold cosine; `af`/`bf` select float vs double input. */
  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
