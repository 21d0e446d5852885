package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VectorPipelineSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("build → append → search → recall over the sf0.001 embeddings") {
    val idx = Files.createTempDirectory("vpipe_spec").toString
    val counts = VectorPipeline.run(s, "/root/testdata/sf0.001", idx).toMap

    // Expectations derived from the data, not hardcoded: the driver
    // regenerates testdata between rounds and the corpus size may move.
    val n = Tables.embeddings(s, "/root/testdata/sf0.001").count()
    assert(counts("vectors") == n)
    assert(counts("built") == n / 2)        // first drop only
    assert(counts("indexed") == n)          // append completed the corpus
    assert(counts("searched") == 50 * 5)    // k rows per query
    // thresholds fit on HALF the corpus still give a usable coarse stage
    // (measured 604000 ppm on this corpus; floor set well below so a
    // driver data regeneration doesn't flake the suite)
    assert(counts("recall_ppm") >= 450000,
      s"recall ${counts("recall_ppm")} ppm below 45%")

    // deterministic: a second run over a fresh index dir is identical
    val again = VectorPipeline.run(s, "/root/testdata/sf0.001",
      Files.createTempDirectory("vpipe_spec2").toString).toMap
    assert(again == counts)
  }
}
