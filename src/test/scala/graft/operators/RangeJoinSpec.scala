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

  private def naiveOverlap(as: Seq[(Long, Long, Long)],
      bs: Seq[(Long, Long, Long)]) =
    (for {
      (aid, alo, ahi) <- as
      (bid, blo, bhi) <- bs
      if alo < bhi && blo < ahi
    } yield (aid, bid)).sorted

  private def binnedOverlap(as: Seq[(Long, Long, Long)],
      bs: Seq[(Long, Long, Long)], w: Long): Seq[(Long, Long)] = {
    val a = as.toDF("aid", "alo", "ahi")
    val b = bs.toDF("bid", "blo", "bhi")
    RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", w)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq.sorted
  }

  test("interval overlap matches the theta join on adversarial layouts") {
    val as = Seq(
      (1L, 0L, 100L),   // spans many bins
      (2L, 15L, 18L),   // inside one bin
      (3L, 9L, 11L),    // straddles a bin edge
      (4L, 200L, 210L)) // disjoint region
    val bs = Seq(
      (10L, 50L, 60L),  // inside a's 1 long span
      (11L, 17L, 30L),  // overlaps 1 and 2
      (12L, 10L, 11L),  // touches 3's tail, bin-edge aligned
      (13L, 100L, 110L))// abuts a1 exactly (hi exclusive: NO overlap)
    for (w <- Seq(1L, 7L, 10L, 64L))
      assert(binnedOverlap(as, bs, w) == naiveOverlap(as, bs),
        s"divergence at binWidth=$w")
  }

  test("an overlapping pair sharing MANY bins still emits exactly once") {
    val as = Seq((1L, 0L, 100L))
    val bs = Seq((2L, 5L, 95L)) // shares ~10 bins at w=10
    assert(binnedOverlap(as, bs, 10L) == Seq((1L, 2L)))
  }
}
