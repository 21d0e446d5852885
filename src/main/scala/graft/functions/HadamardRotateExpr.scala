package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** OPQ-style structured rotation (Ge et al., "Optimized Product
  * Quantization", CVPR 2013; the HD/"random sign + Hadamard" variant of
  * Ailon–Chazelle's fast JL transform): y = (1/√d)·H·D·x, where H is the
  * d×d Walsh–Hadamard matrix (H[i][j] = (−1)^popcount(i AND j)) and D a
  * fixed ±1 diagonal. Applied before the subspace split, it spreads
  * variance evenly across PQ subspaces — the energy-balancing that lifts
  * PQ/IVF-PQ recall when input dimensions are correlated or unevenly
  * scaled — while preserving all L2 distances exactly (orthonormality),
  * so the coarse quantizer's geometry is unchanged.
  *
  * Determinism contract (what makes q_ivfpq_opq oracle-checkable): inputs
  * quantize to ppm longs first (`flip(j)·floor(x_j·1e6)`), the transform
  * runs in EXACT long arithmetic — associative, so the O(d·log d)
  * in-place butterfly here and the oracle's naive O(d²) `list_reduce`
  * sum are equal by construction, not by float luck — and the output is
  * `CAST(h_i AS DOUBLE) / sqrt(d) / 1e6`. The sign diagonal is the pure
  * integer function `flip(j) = ((j·2654435761) mod 97) mod 2 == 0 ? +1 :
  * −1`, replayed verbatim in SQL.
  *
  * Scale shape: one fused codegen pass per row, d·log₂(d) adds — no
  * shuffle, no state; at d=64 that is 384 integer ops per vector vs 4096
  * multiplies for a materialized rotation matrix. Long sums cannot
  * overflow for any sane embedding scale (|x|≤10³ ⇒ |h|≤64·10⁹ ≪ 2⁶³).
  *
  * Requires a power-of-two length (Hadamard matrices of other orders are
  * not this construction); null input → null, evaluated per-row. */
case class HadamardRotateExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hadamard_rotate requires array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    HadamardRotateExpr.rotate(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HadamardRotateExpr.rotate($a, $isFloat)")

  override protected def withNewChildInternal(
      newChild: Expression): HadamardRotateExpr = copy(child = newChild)
}

object HadamardRotateExpr {

  /** ±1 sign diagonal — a fixed, engine-portable integer derivation. */
  def flip(j: Int): Long = if ((j * 2654435761L) % 97 % 2 == 0) 1L else -1L

  /** y = (1/√d)·H·D·x over ppm longs (see class doc). */
  def rotate(a: ArrayData, af: Boolean): ArrayData = {
    val n = a.numElements()
    require(n > 0 && (n & (n - 1)) == 0,
      s"hadamard_rotate requires a power-of-two length, got $n")
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      q(i) = flip(i) * math.floor(x * 1e6).toLong
      i += 1
    }
    // in-place Walsh–Hadamard butterfly: exact long sums, O(n log n)
    var len = 1
    while (len < n) {
      var base = 0
      while (base < n) {
        var j = base
        while (j < base + len) {
          val s = q(j) + q(j + len)
          val d = q(j) - q(j + len)
          q(j) = s
          q(j + len) = d
          j += 1
        }
        base += 2 * len
      }
      len *= 2
    }
    val scale = math.sqrt(n.toDouble)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = q(i).toDouble / scale / 1e6; i += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(HadamardRotateExpr(GraftColumnBridge.expression(c)))
}
