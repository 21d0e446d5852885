package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates — the
  * downstream half of [[TableManifest.readChanges]]: a standing
  * (key, n, sum) state table is folded forward with a change feed
  * instead of re-aggregating the fact table. Cost per step is
  * O(state + changes), independent of the fact table — the whole point
  * at 100 TB, where the derived table is metadata-sized (one row per
  * key) and the base table is not.
  *
  * Sums carry as DECIMAL: incremental maintenance REQUIRES exact
  * arithmetic — a floating-point state that adds and later subtracts
  * the same value drifts from the recomputed answer, silently and
  * permanently (the state never heals). With exact sums the maintained
  * state is provably identical to recomputation after any feed
  * sequence, which is what the oracle hashes. Keys whose count folds to
  * zero leave the state entirely (count > 0 is the liveness predicate —
  * with exact counts a key cannot linger at n = 0 with a residual sum).
  *
  * Correctness contract: the feed must be the multiset delta
  * ([[TableManifest.readChanges]]'s guarantee — applying the feed to
  * the `from` snapshot reproduces the `to` snapshot). Inserts add
  * (+1, +v), deletes fold (−1, −v); a rewrite (delete + insert of one
  * row) nets the value difference.
  */
object IncrementalAgg {

  /** The initial state of a count/sum view over `df`:
    * (keyCols…, n, sum_v) with the sum at decimal(28,6). */
  def initialize(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"))

  /** Fold a change feed (rows + `_change_type` of insert/delete, the
    * [[TableManifest.readChanges]] shape) into `state`. One aggregate
    * over the feed (map-side combinable) + one over state ∪ delta —
    * never a pass over the base table. */
  def maintain(state: DataFrame, changes: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("n"),
        sum(col(valueCol).cast("decimal(28,6)") * sign).as("sum_v"))
    state.select((keyCols.map(col) :+ col("n") :+
        col("sum_v").cast("decimal(28,6)").as("sum_v")): _*)
      .unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
      .filter(col("n") > 0)
  }
}
