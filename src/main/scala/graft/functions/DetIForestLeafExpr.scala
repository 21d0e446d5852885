package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the deterministic isolation-forest walk
  * ([[graft.ml.DetIsolationForest]]): one codegen'd loop computes a row's
  * terminal node id for tree `t` after `maxDepth` hash-derived splits with
  * interval narrowing.
  *
  * Why an expression and not Columns: the relational unrolling is
  * maxDepth × (2·nFeatures + 6) chained projections whose substitution
  * under CollapseProject explodes the optimizer (a depth-8, 3-feature walk
  * overflowed the rule-executor stack). Here the whole walk is a single
  * static call — constant plan size at any depth, and the arithmetic stays
  * bit-identical to the DuckDB mirror
  * ([[graft.ml.DetIsolationForest.oracleSql]]): same
  * `(t·a + d·b + nid·c + k) mod 1000003` hash streams, same
  * `lo + u·(hi−lo)` threshold interpolation, same `>=` branch rule.
  */
case class DetIForestLeafExpr(feats: Expression, lo: Expression,
    hi: Expression, tree: Expression, maxDepth: Int)
    extends QuaternaryExpression {

  require(maxDepth >= 1 && maxDepth <= 32, s"maxDepth in [1,32], got $maxDepth")

  override def first: Expression = feats
  override def second: Expression = lo
  override def third: Expression = hi
  override def fourth: Expression = tree

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrD(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arrD(feats) && arrD(lo) && arrD(hi) && tree.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "det_iforest_leaf requires (array<double>, array<double>, " +
          s"array<double>, bigint), got (${feats.dataType.sql}, " +
          s"${lo.dataType.sql}, ${hi.dataType.sql}, ${tree.dataType.sql})")
  }

  override protected def nullSafeEval(x: Any, l: Any, h: Any, t: Any): Any =
    DetIForestLeafExpr.leaf(x.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      h.asInstanceOf[ArrayData], t.asInstanceOf[Long], maxDepth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, l, h, t) =>
      s"graft.functions.DetIForestLeafExpr.leaf($x, $l, $h, $t, $maxDepth)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): DetIForestLeafExpr =
    copy(feats = newFirst, lo = newSecond, hi = newThird, tree = newFourth)
}

object DetIForestLeafExpr {

  // shared with the DuckDB mirror via graft.ml.DetIsolationForest
  import graft.ml.DetIsolationForest.{A1, A2, A3, B1, B2, B3, C1, C2, Mod}

  /** The walk. `lo0`/`hi0` are the GLOBAL per-feature min/max; the local
    * copies narrow along the path so the threshold at a node is a pure
    * function of (tree, depth, node id) + global ranges — replayable
    * per-row with no cross-row state. */
  def leaf(xs: ArrayData, lo0: ArrayData, hi0: ArrayData, t: Long,
      maxDepth: Int): Long = {
    val nf = xs.numElements()
    val lo = new Array[Double](nf)
    val hi = new Array[Double](nf)
    var i = 0
    while (i < nf) { lo(i) = lo0.getDouble(i); hi(i) = hi0.getDouble(i); i += 1 }
    var nid = 0L
    var d = 0
    while (d < maxDepth) {
      val h1 = (t * A1 + d * A2 + nid * A3 + C1) % Mod
      val h2 = (t * B1 + d * B2 + nid * B3 + C2) % Mod
      val f = (h1 % nf).toInt
      val u = h2.toDouble / Mod.toDouble
      val thr = lo(f) + u * (hi(f) - lo(f))
      if (xs.getDouble(f) >= thr) { nid = nid * 2 + 1; lo(f) = thr }
      else { nid = nid * 2; hi(f) = thr }
      d += 1
    }
    nid
  }

  def apply(feats: Column, lo: Column, hi: Column, tree: Column,
      maxDepth: Int): Column =
    GraftColumnBridge.column(DetIForestLeafExpr(
      GraftColumnBridge.expression(feats), GraftColumnBridge.expression(lo),
      GraftColumnBridge.expression(hi), GraftColumnBridge.expression(tree),
      maxDepth))
}
