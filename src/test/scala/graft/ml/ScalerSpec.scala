package graft.ml

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ScalerSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("population std (ddof=0) and zero-variance clamp to 1.0") {
    // x: mean 2, pop-std sqrt(2/3); konst: zero variance
    val df = Seq((1.0, 9.0), (2.0, 9.0), (3.0, 9.0)).toDF("x", "konst")
    val stats = Scaler.fit(df, Seq("x", "konst"))
    assert(math.abs(stats("x").mean - 2.0) < 1e-12)
    assert(math.abs(stats("x").scale - math.sqrt(2.0 / 3.0)) < 1e-12)
    assert(stats("konst").scale == 1.0) // not 1/0
    val out = Scaler.transform(df, stats)
      .select("x_scaled", "konst_scaled")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.forall { case (_, k) => k == 0.0 })
    assert(math.abs(out.map(_._1).sum) < 1e-12) // centered
  }

  /** Golden check against the reference scaler's decoded parameters
    * (FIXTURES.md §3: regression_scaler_v18.pkl mean_/scale_, smoke vector
    * from dags/db_pipeline_dag.py:37-41). */
  test("reference smoke vector reproduces sklearn's scaled output") {
    val mean = Seq(14.2116, 3.8642, 53.0085, 1000.7639, 123.8155, 363.376,
      1.75798935375e9, 11.4302, 2.8163, 9.0)
    val scale = Seq(3.6494, 1.2397, 14.3966, 55.7478, 46.0183, 208.3585,
      750090.4528, 6.8849, 2.0235, 1.0)
    val smoke = Seq(10.5, 4.0, 68.0, 1000.0, 185.0, 120.0,
      1.7566848e9, 12.0, 2.0, 9.0)
    val stats = mean.zip(scale).map { case (m, s) => Scaler.ColStats(m, s) }
    val out = Scaler.transformVector(smoke, stats)
    assert(math.abs(out(0) - (10.5 - 14.2116) / 3.6494) < 1e-12)
    assert(out(9) == 0.0) // zero-variance month
    // spot golden values: (10.5−14.2116)/3.6494, (1000−1000.7639)/55.7478
    assert(math.abs(out(0) - (-1.0170439)) < 1e-6)
    assert(math.abs(out(3) - (-0.0137028)) < 1e-6)
  }
}
