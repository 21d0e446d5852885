package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: `points.t ∈ [intervals.lo, intervals.hi)` without a
  * nested-loop plan.
  *
  * Spark executes a keyless interval predicate as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits in memory) — O(N·M) row
  * comparisons, the classic 100 TB range-join killer. The standard fix
  * (the same one Databricks' range-join hints and PostGIS tiling use) is
  * to discretize the range axis into fixed-width bins:
  *
  *   - each interval is exploded to every bin it overlaps
  *     (`sequence(lo div w, (hi-1) div w)` — bounded by interval_span/w+1
  *     copies, so pick `w` on the order of the typical interval width);
  *   - each point computes its single containing bin `t div w`;
  *   - the join becomes an EQUI-join on the bin id followed by the exact
  *     `[lo, hi)` re-check.
  *
  * Because a point has exactly ONE bin, a (point, interval) pair can meet
  * at most once — no post-join dedup is needed. Work is
  * Σ_bins points(bin)·intervals(bin): linear in data for any fixed bin
  * occupancy, shuffled by bin id (add the bin to an existing equi-key for
  * skew-free co-partitioning when the join also has one).
  *
  * Both inputs keep all their columns; the helper only appends the exact
  * containment predicate. All bin arithmetic is integer (`div`), so the
  * result is engine-portable and oracle-checkable against the plain theta
  * join.
  */
object RangeJoin {

  /** @param points    left side, one row per point event
    * @param intervals right side, one row per interval
    * @param tCol      long point coordinate on `points`
    * @param loCol     long inclusive lower bound on `intervals`
    * @param hiCol     long exclusive upper bound on `intervals`
    * @param binWidth  bin width in the coordinate's units; intervals
    *                  explode to span/binWidth+1 copies */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      tCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    // One binned code path for both range-join forms: a point t IS the
    // unit interval [t, t+1), so point-in-interval is intervalOverlap with
    // a synthetic exclusive bound — t < hi && lo < t+1 ⟺ lo ≤ t < hi, and
    // the exactly-once emission bin max(t, lo) div w is the point's own
    // bin (overlap implies lo ≤ t), so the point side still explodes to
    // exactly one row per point.
    intervalOverlap(points.withColumn("__pt_hi", col(tCol) + 1L),
        intervals, tCol, "__pt_hi", loCol, hiCol, binWidth)
      .drop("__pt_hi")
  }

  /** Interval-OVERLAP join: pairs where `[left.lo1, left.hi1)` and
    * `[right.lo2, right.hi2)` intersect, still as a binned equi-join.
    *
    * Unlike point-in-interval, BOTH sides explode to their bins and an
    * overlapping pair shares EVERY bin their intersection spans — a naive
    * bin join emits it once per shared bin. The standard exactly-once
    * trick (used by spatial tilers as "reference-point dedup") avoids the
    * expensive post-join `distinct`: a pair is emitted ONLY in the bin
    * that contains the intersection's first point, `max(lo1, lo2)` —
    * every overlapping pair has exactly one such bin, so no dedup stage
    * and no duplicate ever crosses downstream.
    *
    * Work is Σ_bins left(bin)·right(bin) — linear for bounded bin
    * occupancy, shuffled by bin id. Column names on the two sides must be
    * disjoint (the helper joins them into one row). */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lo1: String, hi1: String,
      lo2: String, hi2: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // Same degenerate-input guard as pointInInterval: empty [x,x) intervals
    // have an empty intersection with everything (yet satisfy the strict
    // overlap predicate against intervals ending exactly at x), and an
    // inverted hi < lo would generate a descending — explosively long —
    // bin sequence from a single corrupt row.
    val l = left.filter(col(hi1) > col(lo1)).withColumn("__bin",
      explode(sequence(
        expr(s"$lo1 div ${binWidth}L"),
        expr(s"($hi1 - 1L) div ${binWidth}L"))))
    val r = right.filter(col(hi2) > col(lo2)).withColumn("__bin",
      explode(sequence(
        expr(s"$lo2 div ${binWidth}L"),
        expr(s"($hi2 - 1L) div ${binWidth}L"))))
    l.join(r, Seq("__bin"))
      .filter(col(lo1) < col(hi2) && col(lo2) < col(hi1))
      .filter(expr(s"greatest($lo1, $lo2) div ${binWidth}L") === col("__bin"))
      .drop("__bin")
  }
}
