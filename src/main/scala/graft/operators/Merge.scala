package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Batch MERGE / SCD-type-1 upsert: rows from `updates` replace base rows
  * with the same key; unmatched base rows pass through unchanged. The
  * streaming counterpart (micro-batch dedup-upsert) lives in
  * graft.streaming; this is the batch compaction form a warehouse runs to
  * fold a day's change set into a snapshot.
  *
  * Shape: one left-anti shuffle join on the key plus a union — both
  * sides shuffle exactly once on the key, nothing is collected, and the
  * output is written as new files (no in-place rewrite), which is the
  * 100 TB-safe merge: cost scales with |base| + |updates|, and with the
  * snapshot bucketed by the key the anti join is co-located and
  * shuffle-free on the base side.
  */
object Merge {

  /** @param base     current snapshot
    * @param updates  change set, same schema as `base`
    * @param keys     unique key columns; an `updates` row wins over the
    *                 `base` row with the same key */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
}
