package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for random-hyperplane LSH sign-bucketing:
  * `planes` sign bits of dot products with deterministic pseudo-random
  * hyperplanes, fused into one codegen loop.
  *
  * Replaces the Column-tree formulation (`Knn.signBucketHof`): that builds
  * a planes×dim leaf expression tree — 384 nodes at 6×64, and past ~16
  * planes the generated method exceeds JIT limits and falls out of
  * whole-stage codegen entirely. Here the tree is a single static call
  * whatever the plane count, so deriving `planes` from corpus size
  * (log₂ N growth — see `Knn.planesFor`) stays codegen'd.
  *
  * Bit-identical to the HOF form (spec-proven): same weight formula
  * `frac((p·1315423911 + i·2654435761) mod 1000003 / 1000003) − 0.5` and
  * the same strictly-sequential left-fold accumulation per plane, so the
  * DuckDB oracle's literal-weight mirror keeps matching.
  */
case class SignBucketExpr(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")
  require(offset >= 0, s"offset must be >= 0, got $offset")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bucket requires an array<float|double> argument, got ${other.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    SignBucketExpr.bucket(v.asInstanceOf[ArrayData], planes, offset, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignBucketExpr.bucket($c, $planes, $offset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignBucketExpr =
    copy(child = newChild)
}

object SignBucketExpr {

  /** Deterministic hyperplane weight for plane `p`, dimension `i`.
    * No overflow: p·1.3e9 + i·2.65e9 stays far below Long.MaxValue for any
    * realistic (planes ≤ 62, dim ≤ 1e6). */
  def weight(p: Int, i: Int): Double =
    (((p.toLong * 1315423911L + i.toLong * 2654435761L) % 1000003L)
      .toDouble / 1000003.0) - 0.5

  /** `offset` shifts the hyperplane indices: planes [offset, offset+planes)
    * — independent hash tables for multi-table (k,L) LSH share one weight
    * family without overlap. */
  def bucket(v: ArrayData, planes: Int, offset: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * weight(offset + p, i)
        i += 1
      }
      if (dot >= 0) out |= 1L << p
      p += 1
    }
    out
  }

  def apply(vec: Column, planes: Int): Column =
    GraftColumnBridge.column(SignBucketExpr(
      GraftColumnBridge.expression(vec), planes))

  def apply(vec: Column, planes: Int, offset: Int): Column =
    GraftColumnBridge.column(SignBucketExpr(
      GraftColumnBridge.expression(vec), planes, offset))
}
