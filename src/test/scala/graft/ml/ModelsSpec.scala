package graft.ml

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ModelsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("GBT regressor learns a monotone signal well above baseline") {
    val rng = new Random(3)
    val df = (1 to 800).map { _ =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 5
      (x1, x2, 3.0 * x1 + 2.0 * x2 + rng.nextGaussian() * 0.1)
    }.toDF("x1", "x2", "y")
    val model = Models.fitRegressor(df, Seq("x1", "x2"), "y", maxIter = 10)
    val scored = Models.score(model, df, Seq("x1", "x2"))
    val mse = scored.selectExpr("avg(pow(prediction - y, 2))").head().getDouble(0)
    val varY = df.selectExpr("var_pop(y)").head().getDouble(0)
    assert(mse < varY / 10, s"mse $mse should beat 10% of label variance $varY")
  }

  test("GBT binary classifier separates two shifted clusters") {
    val rng = new Random(4)
    val df = (1 to 600).map { i =>
      val label = i % 2
      val base = if (label == 1) 4.0 else 0.0
      (base + rng.nextGaussian(), base + rng.nextGaussian(), label.toDouble)
    }.toDF("a", "b", "label")
    val model = Models.fitBinaryClassifier(df, Seq("a", "b"), "label", maxIter = 10)
    val scored = Models.score(model, df, Seq("a", "b"))
    val acc = scored
      .selectExpr("CAST(avg(CASE WHEN prediction = label THEN 1.0 ELSE 0.0 END) AS DOUBLE)")
      .head().getDouble(0)
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("feature assembly imputes nulls with 0.0 (reference default)") {
    val df = Seq((Some(1.0), 2.0, 5.0), (None, 3.0, 6.0))
      .toDF("x1", "x2", "y")
    val model = Models.fitRegressor(df, Seq("x1", "x2"), "y", maxIter = 2)
    // scoring a null feature must not throw or produce NaN
    val preds = Models.score(model, df, Seq("x1", "x2"))
      .select("prediction").collect().map(_.getDouble(0))
    assert(preds.forall(p => !p.isNaN))
  }
}
