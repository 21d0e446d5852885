package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe grouped aggregation: two-stage salted aggregate for decomposable
  * functions (count/sum/min/max).
  *
  * A plain `groupBy(key)` hash-partitions by key; at 100 TB one hot key
  * lands entirely on one reducer. Salting splits each key into `salt`
  * subkeys (stage 1: partial agg by (key, salt)), then combines partials by
  * key alone (stage 2: `salt`× fewer rows than the input). Map-side partial
  * aggregation already mitigates mild skew — salting is the lever for the
  * pathological case where even partials concentrate (e.g. high-cardinality
  * distinct-heavy payloads or AQE-less deployments).
  *
  * Result is EXACTLY equal to the unsalted groupBy for decomposable
  * aggregates — which is what the DuckDB oracle asserts.
  */
object SaltedAgg {

  /** Deterministic salt (no rand(): keeps plans replayable) from a second
    * column's hash — spreads a hot key across `salt` reducers. */
  def countSumMinMax(
      df: DataFrame,
      key: String,
      saltBy: Column,
      valueCol: Column,
      salt: Int = 16): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(hash(saltBy), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        // decimal(28,6): exact (order-independent) and holds |v| < 1e22 —
        // (18,6) capped at ~1e12 and would overflow-throw under ANSI
        sum(valueCol.cast("decimal(28,6)")).as("__s"),
        min(valueCol).as("__mn"),
        max(valueCol).as("__mx"))
    stage1
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_v"),
        min(col("__mn")).as("min_v"),
        max(col("__mx")).as("max_v"))
  }
}
