package graft.operators

import graft.{SparkSpec, Tables}
import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Persisted near-dup hash index: build/probe/append/delete/compact on
  * the shared VectorIndex storage contract, plus the exactly-once keyed
  * append replay story. */
class HammingIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def phash(pred: org.apache.spark.sql.Column) = {
    import s.implicits._
    Media.dHash(
      Media.synthesizeCovering(
        Tables.documents(s, "/root/testdata/sf0.001").filter(pred),
        "doc_id", "text").as[Media.MediaRow]).toDF()
  }

  test("probe finds an exact duplicate of a standing item; append makes a drop item standing") {
    val path = Files.createTempDirectory("hidx_spec").toString
    val standing = phash(col("doc_id") < 100).localCheckpoint(true)
    HammingIndex.build(standing, "media_id", "ph_hi", "ph_lo", path)

    // a probe that clones standing item 3's hash under a new id must match it
    val clone = standing.filter(col("media_id") === 3)
      .withColumn("media_id", lit(7777L))
    val hits = HammingIndex.probe(clone, "media_id", "ph_hi", "ph_lo",
        path, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((7777L, 3L)))

    // append a genuinely new item, then a probe of its own hash matches it
    val item = phash(col("doc_id") === 150)
    HammingIndex.append(item, "media_id", "ph_hi", "ph_lo", path)
    val probe2 = HammingIndex.probe(
        item.withColumn("media_id", lit(8888L)),
        "media_id", "ph_hi", "ph_lo", path, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe2.contains((8888L, 150L)))
  }

  test("tombstoned standing ids stop matching; compact changes no verdict; delete works post-compact") {
    val path = Files.createTempDirectory("hidx_del").toString
    val standing = phash(col("doc_id") < 100).localCheckpoint(true)
    HammingIndex.build(standing, "media_id", "ph_hi", "ph_lo", path)
    val drop = phash(col("doc_id") >= 100 && col("doc_id") < 160)
      .localCheckpoint(true)

    VectorIndex.deleteIds(
      standing.filter(col("media_id") % 9 === 0), "media_id", path)
    def verdictMap() = HammingIndex.verdicts(
        drop, "media_id", "ph_hi", "ph_lo", path, maxHamming = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val masked = verdictMap()
    assert(masked.size == 60)
    // deleted standing ids must not contribute matches
    val hitIds = HammingIndex.probe(drop, "media_id", "ph_hi", "ph_lo",
        path, maxHamming = 12)
      .collect().map(_.getLong(1)).toSet
    assert(!hitIds.exists(_ % 9 == 0))

    VectorIndex.compact(s, path)
    assert(verdictMap() == masked, "compaction must not change any verdict")
    assert(VectorIndex.loadTombstones(s, path).count() == 0)

    // post-compact delete of a remaining standing id still masks it
    val someHit = hitIds.headOption
    someHit.foreach { id =>
      import s.implicits._
      VectorIndex.deleteIds(Seq(id).toDF("media_id"), "media_id", path)
      val after = HammingIndex.probe(drop, "media_id", "ph_hi", "ph_lo",
          path, maxHamming = 12)
        .collect().map(_.getLong(1)).toSet
      assert(!after.contains(id))
    }
  }

  test("empty sides under derived band width return zero pairs, not a crash") {
    // the modality-split pipeline shape: a corpus with no items of one
    // modality band-joins an EMPTY frame — bandBits=0 derives the width
    // from count(*)=0 and must degrade to an empty result
    val empty = phash(col("doc_id") < 0).localCheckpoint(true)
    val some = phash(col("doc_id") < 20).localCheckpoint(true)
    assert(MinHashLSH.hammingBandPairs(
      empty, "media_id", "ph_hi", "ph_lo", maxHamming = 12).count() == 0)
    // empty REFERENCE side (the side that sizes the buckets)
    assert(MinHashLSH.hammingBandJoin(
      some, empty, "media_id", "ph_hi", "ph_lo", maxHamming = 12).count() == 0)
    // empty probe side against a real reference
    assert(MinHashLSH.hammingBandJoin(
      empty, some, "media_id", "ph_hi", "ph_lo", maxHamming = 12).count() == 0)
    // simhash twin, same derive-from-count default
    import s.implicits._
    val emptySh = Seq.empty[(Long, Long)].toDF("id", "sh")
    assert(MinHashLSH.simhashBandPairs(
      emptySh, "id", "sh", maxHamming = 3).count() == 0)
    // and a probe against an empty PERSISTED index
    val path = Files.createTempDirectory("hidx_empty").toString
    HammingIndex.build(empty, "media_id", "ph_hi", "ph_lo", path)
    assert(HammingIndex.probe(some, "media_id", "ph_hi", "ph_lo",
      path, maxHamming = 12).count() == 0)
  }

  test("keyed append is exactly-once under replay: same batchId overwrites, not doubles") {
    val path = Files.createTempDirectory("hidx_replay").toString
    HammingIndex.build(phash(col("doc_id") < 50), "media_id", "ph_hi", "ph_lo", path)
    val batch = phash(col("doc_id") >= 50 && col("doc_id") < 70)
      .localCheckpoint(true)
    HammingIndex.append(batch, "media_id", "ph_hi", "ph_lo", path,
      batchId = Some(0L))
    // foreachBatch is at-least-once: the SAME batch replays
    HammingIndex.append(batch, "media_id", "ph_hi", "ph_lo", path,
      batchId = Some(0L))
    val n = HammingIndex.load(s, path).count()
    assert(n == 70, s"replayed keyed append must not double rows, got $n")
    // unkeyed appends still allocate fresh partitions
    HammingIndex.append(
      phash(col("doc_id") === 70), "media_id", "ph_hi", "ph_lo", path)
    assert(HammingIndex.load(s, path).count() == 71)
  }
}
