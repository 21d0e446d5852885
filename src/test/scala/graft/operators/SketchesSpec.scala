package graft.operators

import graft.SparkSpec
import org.apache.datasketches.kll.KllSketch
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  test("KLL merged-daily quantiles honor the published rank-error bound") {
    val rnd = new scala.util.Random(7)
    // lognormal-ish skewed values tagged into 10 "days"
    val rows = (1 to 20000).map(i =>
      (s"day${i % 10}", math.exp(rnd.nextGaussian()) * 100.0))
    val df = rows.toDF("d", "v").repartition(8)
    val k = 200
    val daily = Sketches.kllMergeByKey(Sketches.kllPartials(df, "d", "v", k), "d", k)
    val parts = daily.collect()
    assert(parts.length == 10)
    val acc = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
    parts.foreach(r => acc.merge(Sketches.kllFromBytes(r.getAs[Array[Byte]]("kll"))))
    assert(acc.getN == 20000)
    val sorted = rows.map(_._2).sorted
    val tol = 2 * KllSketch.getNormalizedRankError(k, false)
    for (p <- Seq(0.05, 0.5, 0.9, 0.99)) {
      val est = acc.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
      val trueRank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(trueRank - p) <= tol,
        s"p=$p est=$est trueRank=$trueRank tol=$tol")
    }
  }

  test("KLL skips null values and null keys") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (None, Some(9.0)), (Some("a"), Some(2.0)))
      .toDF("d", "v")
    val m = Sketches.kllMergeByKey(Sketches.kllPartials(df, "d", "v", 200), "d", 200)
      .collect()
    assert(m.length == 1)
    assert(Sketches.kllFromBytes(m(0).getAs[Array[Byte]]("kll")).getN == 2)
  }

  test("Theta sketches are exact below nominal entries: union and intersection") {
    // two overlapping id sets, both < 2^12 distinct => exact mode
    val a = (1L to 3000L).map(("a", _))
    val b = (2001L to 5000L).map(("b", _))
    val df = (a ++ b).toDF("seg", "id").repartition(8)
    val perSeg = Sketches.thetaMergeByKey(
      Sketches.thetaPartials(df, "seg", "id", 12), "seg", 12)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("theta")).toMap
    assert(Sketches.thetaFromBytes(perSeg("a")).getEstimate == 3000.0)
    assert(Sketches.thetaFromBytes(perSeg("b")).getEstimate == 3000.0)
    val inter = Sketches.thetaIntersect(perSeg("a"), perSeg("b"))
    assert(inter.getEstimate == 1000.0) // 2001..3000
  }

  test("Theta estimation-mode bounds contain the exact cardinality") {
    val rnd = new scala.util.Random(11)
    val ids = (1 to 60000).map(_ => rnd.nextLong() % 40000)
    val exact = ids.distinct.size
    val df = ids.map(("x", _)).toDF("seg", "id").repartition(8)
    val sk = Sketches.thetaMergeByKey(
      Sketches.thetaPartials(df, "seg", "id", 12), "seg", 12)
      .collect()(0).getAs[Array[Byte]]("theta")
    val c = Sketches.thetaFromBytes(sk)
    assert(c.getLowerBound(3) <= exact && exact <= c.getUpperBound(3),
      s"exact=$exact lb=${c.getLowerBound(3)} ub=${c.getUpperBound(3)}")
  }
}
