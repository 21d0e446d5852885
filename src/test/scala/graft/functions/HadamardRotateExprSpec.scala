package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OPQ rotation's three contracts: the O(d·log d) butterfly equals
  * the naive O(d²) Hadamard row-sum definition bit-for-bit (exact long
  * arithmetic — this is what the DuckDB oracle replays), the rotation is
  * orthonormal up to ppm quantization (L2 distances preserved), and
  * non-power-of-two inputs are rejected. */
class HadamardRotateExprSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** The definition the oracle uses: y_i = (Σ_j ±q_j) / √d / 1e6 with
    * q_j = flip(j)·floor(x_j·1e6) and sign (−1)^popcount(i AND j). */
  private def naive(x: Seq[Float]): Seq[Double] = {
    val n = x.length
    val q = Array.tabulate(n)(j =>
      HadamardRotateExpr.flip(j) * math.floor(x(j) * 1e6).toLong)
    (0 until n).map { i =>
      var acc = 0L
      var j = 0
      while (j < n) {
        acc += (if (java.lang.Long.bitCount((i & j).toLong) % 2 == 0) q(j)
                else -q(j))
        j += 1
      }
      acc.toDouble / math.sqrt(n.toDouble) / 1e6
    }
  }

  test("butterfly equals the naive Hadamard definition bit-for-bit") {
    val rows = emb.limit(50)
      .select(col("vec_id"), col("embedding"),
        HadamardRotateExpr(col("embedding")).as("rot"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getSeq[Float](1)
      val got = r.getSeq[Double](2)
      val want = naive(x)
      assert(got == want, s"vec_id ${r.getLong(0)}: butterfly != naive")
    }
  }

  test("rotation preserves L2 distances up to ppm quantization") {
    val rot = emb.select(col("vec_id"), col("embedding"),
      HadamardRotateExpr(col("embedding")).as("rot"))
    val a = rot.filter(col("vec_id") < 10).as("a")
    val b = rot.filter(col("vec_id").between(10, 19)).as("b")
    val pairs = a.crossJoin(b).select(
        L2SqExpr(col("a.embedding"), col("b.embedding")).as("d_orig"),
        L2SqExpr(col("a.rot"), col("b.rot")).as("d_rot"))
      .collect()
    assert(pairs.length == 100)
    pairs.foreach { r =>
      val (o, q) = (r.getDouble(0), r.getDouble(1))
      // quantization moves each coordinate by < 1e-6; for 64 dims and
      // coordinates O(1) the distance perturbation is well under 1e-3
      assert(math.abs(o - q) < 1e-3, s"L2 not preserved: $o vs $q")
    }
  }

  test("deterministic: two evaluations produce identical arrays") {
    val one = emb.select(HadamardRotateExpr(col("embedding")).as("r"))
      .collect().map(_.getSeq[Double](0))
    val two = emb.select(HadamardRotateExpr(col("embedding")).as("r"))
      .collect().map(_.getSeq[Double](0))
    assert(one.toSeq == two.toSeq)
  }

  test("non-power-of-two length is rejected") {
    val ex = intercept[Exception] {
      s.range(1).select(HadamardRotateExpr(
          array(lit(1.0f), lit(2.0f), lit(3.0f))).as("r"))
        .collect()
    }
    assert(ex.getMessage.contains("power-of-two") ||
      Option(ex.getCause).exists(_.getMessage.contains("power-of-two")))
  }
}
