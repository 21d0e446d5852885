package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("bloom-pruned semi join equals plain semi join (fpp-independent)") {
    val probe = (1L to 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (1L to 5000L).filter(_ % 13 == 0).map(i => (i, "b")).toDF("bk", "x")

    val expected = probe
      .join(build.select($"bk".as("k")), Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted

    // a deliberately terrible fpp still yields the exact result
    for (fpp <- Seq(0.5, 0.03)) {
      val got = BloomPrune.semiJoin(probe, "k", build, "bk", 512, fpp)
        .collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expected), s"fpp=$fpp")
    }
  }

  test("no false negatives: every matching key survives the pre-filter") {
    val build = (1L to 1000L).map(i => (i * 7, "d")).toDF("bk", "d")
    val bloom = build.stat.bloomFilter("bk", 1000, 0.01)
    (1L to 1000L).foreach(i => assert(bloom.mightContainLong(i * 7)))
  }

  test("null probe keys are dropped, matching semi-join semantics") {
    val probe = Seq(Some(1L), None, Some(2L), Some(99L))
      .toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    val got = BloomPrune.semiJoin(probe, "k", build, "bk", 16)
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L)))
  }
}
