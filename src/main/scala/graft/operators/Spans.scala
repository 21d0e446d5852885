package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union accounting (gaps-and-islands): given per-key start
  * positions of fixed-width intervals, merge overlapping/touching
  * intervals and report how much each key is covered.
  *
  * The shape behind duplicated-span dedup (q_exact_substr), highlight
  * merging, and coverage accounting. Scale: two windows, both partitioned
  * by the key — per-task state is one carried running maximum, so memory
  * is bounded by the widest single partition, not the table.
  *
  * A new island starts when an interval begins at-or-after the running
  * max end of all earlier intervals (ties = touching intervals split
  * islands, which leaves covered length unchanged — islands never
  * overlap, so Σ(end−start) is exact).
  */
object Spans {

  /** Per-key covered-position count from fixed-width interval starts.
    *
    * @param df    input rows, one fixed-width interval each
    * @param key   partition key column name
    * @param pos   interval start column (long)
    * @param width interval width (covers [pos, pos+width))
    * @return (key, n_intervals, covered) — one row per key present in df
    */
  def coveredLength(df: DataFrame, key: String, pos: String, width: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(pos))
    val prevMax: Column = max(col(pos) + width)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__brk",
        when(prevMax.isNull || col(pos) >= prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__island"))
      .agg(min(col(pos)).as("__s"), max(col(pos) + width).as("__e"),
        count(lit(1)).as("__np"))
      .groupBy(col(key))
      .agg(sum(col("__np")).as("n_intervals"),
        sum(col("__e") - col("__s")).as("covered"))
  }
}
