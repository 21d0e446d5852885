package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-group — the reference's signature operator
  * (`DISTINCT ON (machineid) ... ORDER BY machineid, timestamp_epoch DESC`,
  * /root/reference/project/db.py:237-246 and 8 sibling accessors).
  *
  * Two formulations with identical semantics (ties broken by the caller's
  * `ord` columns, which must end in a unique tiebreaker for determinism):
  *
  *  - `maxBy`: single-pass hash aggregate `max_by(struct(cols), struct(ord))`.
  *    Gets map-side partial aggregation — at 100 TB this moves one
  *    pre-aggregated row per (key × map task) through the shuffle instead of
  *    every input row, and needs no sort. Preferred.
  *
  *  - `window`: `row_number() over (partition by key order by ord desc)`.
  *    Shuffles ALL rows then sorts each partition — kept for comparison and
  *    for callers that need the other rows too (rank > 1).
  */
object LatestPerKey {

  /** Keep, per `key`, the row with the greatest `ord` tuple. */
  def maxBy(df: DataFrame, key: String, ord: Seq[Column]): DataFrame = {
    val others = df.columns.filterNot(_ == key).toSeq
    df.groupBy(col(key))
      .agg(max_by(struct(others.map(col): _*), struct(ord: _*)).as("__r"))
      .select(col(key) +: others.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Same semantics via row_number window (ord descending). */
  def window(df: DataFrame, key: String, ordDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ordDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
