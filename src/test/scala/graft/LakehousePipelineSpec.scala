package graft

import org.scalatest.funsuite.AnyFunSuite

/** The lakehouse loop end-to-end: the pipeline's own `require`
  * cross-checks (maintained view ≡ recompute, synced index ≡ fresh
  * build, metadata count ≡ scan) must all hold, and the stage counts
  * must be internally consistent. */
class LakehousePipelineSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("snapshot→mutate→fold→maintain→serve, all cross-checks green") {
    val work = java.nio.file.Files
      .createTempDirectory("lake_spec").toString
    // run() requires-out loudly on any incremental divergence
    val counts = LakehousePipeline
      .run(s, "/root/testdata/sf0.001", work).toMap
    assert(counts("rows_landed") == 500L)
    // the mutation cycle deleted doc_id % 17 = 0 (30 of 500) and added
    // the % 11 = 0 clones (46): final = 500 - 30 + 46
    assert(counts("rows_final") == 516L,
      s"unexpected final rows: $counts")
    // the feed carried exactly the deletes + the drop
    assert(counts("change_rows_folded") == 30L + 46L)
    assert(counts("bm25_top") == 5L)
    assert(counts("point_probe") > 0L && counts("range_probe") > 0L)
  }
}
