package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed retrieval metrics: hits, reciprocal rank, precision and
  * recall at k, zero-hit queries, judged-but-unpredicted queries, and
  * the macro summary. */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("per-query metrics and macro summary, hand-checked") {
    import s.implicits._
    // q0: rel {1,2,3}; top-3 = (1@1, 9@2, 2@3) → hits 2, fr 1
    // q1: rel {5};     top-3 = (7@1, 5@2, 8@3) → hits 1, fr 2
    // q2: rel {6,7};   top-3 all misses        → hits 0
    // q3: judged {9} but NO predictions at all → hits 0, rr 0
    val pred = Seq(
      (0L, 1L, 1), (0L, 9L, 2), (0L, 2L, 3), (0L, 3L, 4), // rank 4 > k
      (1L, 7L, 1), (1L, 5L, 2), (1L, 8L, 3),
      (2L, 10L, 1), (2L, 11L, 2), (2L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val rel = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 3L), // dup judgment
      (1L, 5L), (2L, 6L), (2L, 7L), (3L, 9L))
      .toDF("query_id", "doc_id")
    val m = RetrievalEval.metricsAtK(pred, rel, "query_id", "doc_id",
      "rank", k = 3)
    val rows = m.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(rows(0L) == ((3L, 2L, 1000000L, 666666L, 666666L)))
    assert(rows(1L) == ((1L, 1L, 500000L, 333333L, 1000000L)))
    assert(rows(2L) == ((2L, 0L, 0L, 0L, 0L)))
    assert(rows(3L) == ((1L, 0L, 0L, 0L, 0L)),
      "a judged query with no predictions must still score (as zero)")
    assert(rows.size == 4)

    val sm = RetrievalEval.summaryAtK(m).head()
    assert(sm.getLong(0) == 4L)
    assert(sm.getLong(1) == (1000000L + 500000L) / 4) // MRR
    assert(sm.getLong(2) == (666666L + 333333L) / 4)  // mean P@3
    assert(sm.getLong(3) == (666666L + 1000000L) / 4) // mean R@3
  }

  test("an unjudged query is excluded; rank cutoff respected") {
    import s.implicits._
    val pred = Seq((0L, 1L, 1), (9L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val rel = Seq((0L, 2L)).toDF("query_id", "doc_id")
    val m = RetrievalEval.metricsAtK(pred, rel, "query_id", "doc_id",
      "rank", k = 1)
    assert(m.collect().map(_.getLong(0)).toSeq == Seq(0L),
      "query 9 has no judgments → no defined recall → excluded")
  }
}
