package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the latest right row with
  * `right.time <= left.time` ([[backward]]) or the earliest right row with
  * `right.time >= left.time` ([[forward]]), matching on an equality key.
  * Left-outer semantics (unmatched left rows keep null right columns).
  *
  * Implementation is the union + last-non-null-carry-forward pattern:
  * tag both inputs, union, then one window sorted by (key, time, side) and
  * `last(col, ignoreNulls = true)` carries the most recent right values onto
  * each left row. Exactly ONE shuffle + sort over |L| + |R| rows — no
  * range-condition theta join (which Spark would execute as a broadcast
  * nested loop) and no per-key explode, so it scales linearly to 100 TB.
  *
  * Right side must be unique per (key, time); callers dedupe first (e.g.
  * with [[LatestPerKey]]) so ties are deterministic on both the engine and
  * the oracle (DuckDB `ASOF JOIN`) side.
  */
object AsOfJoin {

  /** @param rightValueCols right columns to carry (will be prefixed `asof_`)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String]): DataFrame =
    join(left, right, key, leftTime, rightTime, rightValueCols, fwd = false)

  /** Forward variant: earliest right row at/after the left time — same
    * single-shuffle union+window shape, carry direction reversed. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String]): DataFrame =
    join(left, right, key, leftTime, rightTime, rightValueCols, fwd = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      fwd: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val carried  = rightValueCols.map(c => s"asof_$c")

    // Common layout: key, __t, __side, <leftCols as-is>, <carried cols>.
    val lNorm = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (col(key) +: col("__t") +: col("__side") +:
          leftCols.filterNot(_ == key).map(col)) ++
          carried.map(c => lit(null).cast(
            right.schema(rightValueCols(carried.indexOf(c))).dataType).as(c)): _*)

    val rNorm = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (col(key) +: col("__t") +: col("__side") +:
          leftCols.filterNot(_ == key).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c))) ++
          rightValueCols.zip(carried).map { case (rc, ac) => col(rc).as(ac) }: _*)

    // Both directions use last() over [unboundedPreceding, currentRow] —
    // Spark executes that as an O(n) running frame. (A first() over
    // [currentRow, unboundedFollowing] would be re-evaluated per row:
    // O(partition²).) Direction is encoded in traversal order:
    //  - backward: time ASC, right (side 0) before left at equal time →
    //    carry = latest right at/before the left row;
    //  - forward: time DESC, right before left at equal time → carry =
    //    EARLIEST right at/after the left row (nearest in desc traversal).
    val w = Window.partitionBy(col(key))
      .orderBy(if (fwd) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withCarry = carried.foldLeft(lNorm.unionByName(rNorm)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    withCarry
      .filter(col("__side") === 1)
      .drop("__t", "__side")
  }
}
