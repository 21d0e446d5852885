package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("end-to-end media run: count algebra, dedup bites, deterministic") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_media_spec").toString + "/media"
    val counts = MediaPipeline.run(s, "/root/testdata/sf0.001", out).toMap

    assert(counts("raw") == 500)
    assert(counts("after_gate") <= counts("raw"))
    // the corpus plants near-dups: the perceptual stage must bite
    assert(counts("dropped") > 0)
    // exactly one keeper survives per cluster — a real check now that
    // runMedia counts the drop set itself (dropIds.count()) rather than
    // deriving "dropped" from this same difference
    assert(counts("dropped") == counts("clustered_items") - counts("dup_clusters"))
    assert(counts("written") == counts("after_gate") - counts("dropped"))

    val survivors = s.read.parquet(out)
    assert(survivors.count() == counts("written"))
    assert(survivors.select(col("kind")).distinct().count() == 3)
    // survivor set is duplicate-free at the pipeline's own radius: re-run
    // the dedup over the survivors and nothing further drops
    val again = MediaPipeline.runMedia(s, survivors, out + "_again").toMap
    assert(again("dropped") == 0)
    assert(again("written") == counts("written"))
  }

  test("an injected AUDIO exact duplicate collapses through the fingerprint route") {
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(40)
    val base = Media.synthesizeCovering(docs, "doc_id", "text")
    // doc_id 1 → kind "audio": its dedup runs through audioFingerprint,
    // not dHash — same payload ⇒ same fingerprint ⇒ hamming-0 pair, and
    // the smaller id (1) is the keeper at equal size
    val dup = base.filter(col("media_id") === 1)
      .withColumn("media_id", col("media_id") + 800000L)
    val out = java.nio.file.Files
      .createTempDirectory("graft_media_adup").toString + "/m"
    MediaPipeline.runMedia(s, base.unionByName(dup), out)
    val ids = s.read.parquet(out).select("media_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(800001L))
  }

  test("an injected exact duplicate loses to the larger payload keeper") {
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(30)
    val base = Media.synthesizeCovering(docs, "doc_id", "text")
    // duplicate of item 0's payload under a new id: same bytes ⇒ same
    // hash ⇒ same cluster; equal size, so the SMALLER id (0) is kept
    val dup = base.filter(col("media_id") === 0)
      .withColumn("media_id", col("media_id") + 900000L)
    val out = java.nio.file.Files
      .createTempDirectory("graft_media_dup").toString + "/m"
    MediaPipeline.runMedia(s, base.unionByName(dup), out)
    val ids = s.read.parquet(out).select("media_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(0L) && !ids.contains(900000L))
  }
}
