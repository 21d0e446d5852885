package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("end-to-end curation run: monotone survivors, shards readable, deterministic") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation_spec").toString + "/shards"
    val counts = CurationPipeline
      .run(s, "/root/testdata/sf0.001", out).toMap

    assert(counts("raw") == 500)
    // each stage can only drop documents
    assert(counts("after_quality") <= counts("raw"))
    assert(counts("after_exact_dedup") <= counts("after_quality"))
    assert(counts("after_near_dup") <= counts("after_exact_dedup"))
    // the synthetic corpus contains planted near-dups: the stage must bite
    assert(counts("after_near_dup") < counts("raw"))
    assert(counts("after_near_dup") > 0 && counts("packed_sequences") > 0)
    // every surviving doc lands in exactly one shard row
    assert(counts("written") == counts("after_near_dup"))

    val shards = s.read.parquet(out)
    assert(shards.select(col("shard")).distinct().count() > 1)
    // packing invariant: a doc's slot is within the packed stream
    assert(shards.filter(col("end_seq") < col("start_seq")).count() == 0)

    // deterministic: a second run yields identical stage counts
    val again = CurationPipeline
      .run(s, "/root/testdata/sf0.001", out + "_2").toMap
    assert(again == counts)
  }
}
