package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the latest right row with
  * `right.time <= left.time` ([[backward]]) or the earliest right row with
  * `right.time >= left.time` ([[forward]]), matching on an equality key.
  * Left-outer semantics (unmatched left rows keep null right columns); a
  * null left time matches nothing, and null right times never match —
  * DuckDB `ASOF JOIN` semantics.
  *
  * Implementation is the union + carry pattern: tag both inputs, union,
  * then one window carries the nearest right row onto each left row. The
  * carry is a single STRUCT of all right value columns (never null for a
  * right row), so the matched row is attached atomically — carried nulls
  * stay null, and values from different right rows can never mix. Exactly
  * ONE shuffle + sort over |L| + |R| rows — no range-condition theta join
  * (which Spark would execute as a broadcast nested loop) and no per-key
  * explode, so it scales linearly to 100 TB.
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
    val carryType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    // Common layout: key, __t, __side, <leftCols as-is>, __carry struct.
    val lNorm = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (col(key) +: col("__t") +: col("__side") +:
          leftCols.filterNot(_ == key).map(col)) :+
          lit(null).cast(carryType).as("__carry"): _*)

    // Null right times can never be an as-of match — drop them up front
    // (they would otherwise sort first/last and pollute the carry).
    val rNorm = right
      .filter(col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (col(key) +: col("__t") +: col("__side") +:
          leftCols.filterNot(_ == key).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c))) :+
          struct(rightValueCols.map(col): _*).as("__carry"): _*)

    // One carry of the whole struct with last(ignoreNulls) over
    // [unboundedPreceding, currentRow] — an O(n) running frame. (A
    // first() over [currentRow, unboundedFollowing] would be re-evaluated
    // per row: O(partition²).) Direction is encoded in traversal order:
    //  - backward: time ASC, right (side 0) before left at equal time →
    //    carry = latest right at/before the left row;
    //  - forward: time DESC, right before left at equal time → carry =
    //    EARLIEST right at/after the left row (nearest in desc traversal).
    val w = Window.partitionBy(col(key))
      .orderBy(if (fwd) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Null left times match nothing (mask the carry afterwards).
    lNorm.unionByName(rNorm)
      .withColumn("__carry",
        when(col("__t").isNotNull,
          last(col("__carry"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(
        (col(key) +: leftCols.filterNot(_ == key).map(col)) ++
          rightValueCols.map(c => col(s"__carry.`$c`").as(s"asof_$c")): _*)
  }
}
