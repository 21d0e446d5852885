package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join: equivalence to the naive theta join on adversarial
  * interval layouts, and the plan-shape guarantee that motivates it. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)]) =
    (for {
      (pid, t) <- points
      (iid, lo, hi) <- intervals
      if t >= lo && t < hi
    } yield (pid, iid)).sorted

  private def binned(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)],
      w: Long): Seq[(Long, Long)] = {
    val p = points.toDF("pid", "t")
    val i = intervals.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(p, i, "t", "lo", "hi", w)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
  }

  test("matches the theta join: spans >> bin, = bin, << bin, exact edges") {
    val points = Seq.tabulate(40)(k => (k.toLong, k.toLong * 3))
    val intervals = Seq(
      (0L, 0L, 1L),     // width 1
      (1L, 5L, 35L),    // spans several bins
      (2L, 10L, 10L),   // empty [10,10)
      (3L, 7L, 14L),    // bin-straddling
      (4L, 0L, 120L),   // covers everything
      (5L, 119L, 200L)) // tail past the last point
    for (w <- Seq(1L, 7L, 10L, 64L))
      assert(binned(points, intervals, w) == naive(points, intervals),
        s"binWidth=$w diverges")
  }

  test("a (point, interval) pair appears exactly once (no bin-explode dup)") {
    val points = Seq((1L, 50L))
    val intervals = Seq((9L, 0L, 100L)) // explodes to many bins at w=10
    assert(binned(points, intervals, 10L) == Seq((1L, 9L)))
  }

  test("plans an equi-join, never a nested-loop/cartesian node") {
    val p = Seq((1L, 5L)).toDF("pid", "t")
    val i = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val s = RangeJoin.pointInInterval(p, i, "t", "lo", "hi", 7L)
      .queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$s")
  }
}
