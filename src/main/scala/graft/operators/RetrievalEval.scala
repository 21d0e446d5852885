package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics at a cutoff — the evaluation loop
  * for the search family (BM25/hybrid/ANN serving): given a ranked
  * prediction table and a relevance-judgment table (qrels), score each
  * query with the standard cutoff metrics, all in EXACT integer-ppm
  * arithmetic (reciprocal ranks and hit ratios are rationals; log-based
  * gains like NDCG are deliberately out — not bit-portable across
  * engines, the repo-wide oracle discipline).
  *
  * Scale: one shuffle on the query id. Predictions are top-k per query
  * (k × #queries rows by construction); qrels aggregate to per-query
  * counts map-side. Nothing is corpus-sized.
  */
object RetrievalEval {

  /** Per-query metrics at cutoff `k`.
    *
    * `pred`: (qCol, dCol, rankCol) — ranks ascending from 1, unique per
    * (query, doc). `rel`: (qCol, dCol) judgments (deduplicated here, so
    * multi-graded qrels can be passed collapsed). Output, one row per
    * query WITH at least one judgment: n_rel, hits_at_k, rr_ppm
    * (1e6 ÷ first relevant rank, 0 when none ranked ≤ k), p_at_k_ppm
    * (hits ÷ k), r_at_k_ppm (hits ÷ n_rel). Queries absent from `rel`
    * have no defined recall and are excluded — standard qrels
    * semantics. */
  def metricsAtK(pred: DataFrame, rel: DataFrame, qCol: String,
      dCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val qrels = rel.select(col(qCol), col(dCol)).distinct()
    val nRel = qrels.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val hits = pred.filter(col(rankCol) <= k)
      .join(qrels, Seq(qCol, dCol), "left_semi")
      .groupBy(col(qCol))
      .agg(count(lit(1)).as("__h"), min(col(rankCol)).as("__fr"))
    nRel.join(hits, Seq(qCol), "left")
      .select(col(qCol), col("n_rel"),
        coalesce(col("__h"), lit(0L)).as("hits_at_k"),
        coalesce(expr("1000000L div CAST(__fr AS BIGINT)"), lit(0L))
          .as("rr_ppm"),
        expr(s"coalesce(__h, 0L) * 1000000L div ${k}L").as("p_at_k_ppm"),
        expr("coalesce(__h, 0L) * 1000000L div n_rel").as("r_at_k_ppm"))
  }

  /** Macro summary of [[metricsAtK]]'s output: query count, MRR, and
    * mean precision/recall at k — each the ppm-sum ÷ #queries (exact
    * integer division, so the summary is as bit-portable as the
    * per-query rows). */
  def summaryAtK(perQuery: DataFrame): DataFrame =
    perQuery.agg(count(lit(1)).as("n_queries"),
        sum(col("rr_ppm")).as("__sr"),
        sum(col("p_at_k_ppm")).as("__sp"),
        sum(col("r_at_k_ppm")).as("__sr2"))
      .select(col("n_queries"),
        expr("__sr div n_queries").as("mrr_ppm"),
        expr("__sp div n_queries").as("mean_p_ppm"),
        expr("__sr2 div n_queries").as("mean_r_ppm"))
}
