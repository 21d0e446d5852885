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

  /** TRANSACTIONAL incremental view: the maintained (key, n, sum) state
    * lives on its own [[TableManifest]] table carrying an `__asof`
    * column (the source version it has folded through), and each call
    * advances it to the source's current version with one snapshot
    * commit — state and progress move atomically, which is what makes
    * streaming maintenance EXACTLY-ONCE under foreachBatch's
    * at-least-once replays: a replayed source append overwrites its own
    * `__batch` partition (keyed replay), so the watermark does not
    * advance and the replayed call's change feed (asof → current) is
    * EMPTY — the fold is idempotent by the version arithmetic, no
    * dedup bookkeeping needed. A zero-key state cannot carry its asof
    * (no rows), so it re-initializes from the source — a full
    * aggregate, exact, and only reachable when the view was empty.
    * Returns the source version the state now reflects. */
  def maintainTable(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, statePath: String, keyCols: Seq[String],
      valueCol: String): Long = {
    val cur = TableManifest.versions(spark, tablePath).last
    def fullInit() =
      initialize(TableManifest.readAt(spark, tablePath, cur), keyCols,
        valueCol).withColumn("__asof", lit(cur))
    if (TableManifest.versions(spark, statePath).isEmpty) {
      TableManifest.commitSnapshot(fullInit(), statePath)
      return cur
    }
    val st = TableManifest.read(spark, statePath)
    val asofRow = st.select(col("__asof")).limit(1).collect()
    if (asofRow.isEmpty) { // zero-key state: re-derive, stays exact
      TableManifest.commitSnapshot(fullInit(), statePath)
      return cur
    }
    val asof = asofRow(0).getLong(0)
    if (asof == cur) return cur // nothing new — no empty commit
    val next = maintain(st.drop("__asof"),
        TableManifest.readChanges(spark, tablePath, asof, cur),
        keyCols, valueCol)
      .withColumn("__asof", lit(cur))
    TableManifest.commitSnapshot(next, statePath)
    cur
  }

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
