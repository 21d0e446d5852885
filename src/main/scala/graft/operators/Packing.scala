package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard LLM-pretraining
  * batching step: documents are concatenated in a deterministic order and
  * the token stream is cut into fixed-length training sequences; a
  * document may span a sequence boundary. Output maps every document to
  * its (start_seq, end_seq, start_off) slot in the packed stream.
  *
  * The global token prefix-sum is computed DISTRIBUTED: docs are bucketed
  * by id range, each bucket cumsums locally (window partitioned by
  * bucket), and bucket start-offsets come from a prefix over the tiny
  * per-bucket totals table (rows = #buckets, metadata-sized) broadcast
  * back. A naive `Window.orderBy(id)` with no partition spec would pull
  * ALL rows through one partition — the classic scale-killer this
  * formulation avoids; work is one narrow agg + one bounded window, and
  * the only full-order structure ever materialized is #buckets rows.
  */
object Packing {

  /** @param bucketSize id-range width per prefix-sum bucket; choose so
    *   #buckets stays metadata-sized (e.g. 1e6 at billions of docs) while
    *   each bucket's window fits an executor. */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokensCol: Column,
      seqLen: Long,
      bucketSize: Long = 1000000L): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
        tokensCol.cast("long").as("n_tokens"))
      .withColumn("__bucket", expr(s"doc_id div $bucketSize"))
    val perBucket = t.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btot"))
    // prefix over #buckets rows — tiny by construction, broadcast back
    val wb = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wb), lit(0L)))
      .select(col("__bucket"), col("__boff"))
    val wi = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__cum", col("__boff") + sum(col("n_tokens")).over(wi))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(__cum - n_tokens) div $seqLen").as("start_seq"),
        expr(s"(__cum - 1) div $seqLen").as("end_seq"),
        expr(s"(__cum - n_tokens) % $seqLen").as("start_off"))
  }
}
