package graft.ml

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class IsolationForestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def data = {
    val rng = new Random(1)
    val normal = (1 to 400).map(i =>
      (i.toLong, 10.0 + rng.nextGaussian(), 5.0 + rng.nextGaussian()))
    val outliers = Seq((901L, 100.0, -50.0), (902L, -80.0, 90.0))
    (normal ++ outliers).toDF("id", "a", "b")
  }

  test("planted outliers score in the global top ranks") {
    val df = data
    val model = IsolationForest.fit(df, Seq("a", "b"), nTrees = 50, seed = 42L)
    val scored = IsolationForest.scoreAll(spark, df, Seq("a", "b"), model)
    val top = scored.orderBy(scored("anomaly_score").desc)
      .select("id").as[Long].take(5).toSet
    assert(top.contains(901L) && top.contains(902L))
  }

  test("scores are deterministic for a fixed seed and in (0, 1]") {
    val df = data
    val m1 = IsolationForest.fit(df, Seq("a", "b"), nTrees = 20, seed = 7L)
    val m2 = IsolationForest.fit(df, Seq("a", "b"), nTrees = 20, seed = 7L)
    val x = Array(10.0, 5.0)
    assert(m1.score(x) == m2.score(x))
    val s = m1.score(x)
    assert(s > 0.0 && s <= 1.0)
    // an inlier scores clearly below a gross outlier
    assert(m1.score(Array(100.0, -50.0)) > s)
  }
}
