package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The snapshot layer under index compaction: readers pinned to an old
  * manifest version keep fully intact files after compact, commits are
  * monotone version markers, and vacuum (and only vacuum) reclaims. */
class IndexManifestSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("compact commits a new version; the old version stays readable until vacuum") {
    val path = Files.createTempDirectory("manifest_spec").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    assert(IndexManifest.currentVersion(s, path).contains(0L))

    val v0Rows = s.read.parquet(s"$path/codes_v0").count()
    VectorIndex.deleteIds(emb.filter(col("vec_id") % 4 === 0), "vec_id", path)
    val nDeleted = emb.filter(col("vec_id") % 4 === 0).count()

    // the delete committed its own version (v1); a "reader" resolves
    // the pre-compact payload...
    assert(IndexManifest.currentVersion(s, path).contains(1L))
    val pinnedDir = IndexManifest.codesDir(s, path)
    VectorIndex.compact(s, path)
    // ...and its directory is COMPLETELY intact afterwards — the
    // guarantee the old swap-in-place could not give
    assert(IndexManifest.currentVersion(s, path).contains(2L))
    assert(s.read.parquet(pinnedDir).count() == v0Rows,
      "compact must never delete or modify the previous version's files")
    assert(s.read.parquet(s"$path/codes_v2").count() == v0Rows - nDeleted)
    // the new version starts with an empty delete log
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
    // and the live view is the compacted one
    assert(VectorIndex.loadBinaryCodes(s, path).count() == v0Rows - nDeleted)

    // vacuum reclaims everything but the current version
    VectorIndex.vacuum(s, path, keep = 1)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes_v0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes_v2")))
    assert(IndexManifest.currentVersion(s, path).contains(2L))
    // the live view is untouched by vacuum
    assert(VectorIndex.loadBinaryCodes(s, path).count() == v0Rows - nDeleted)
  }

  test("describe reports version, live/raw counts, batches, tombstones, bytes") {
    val path = Files.createTempDirectory("manifest_describe").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    VectorIndex.appendBinary(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 120),
      "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") < 10), "vec_id", path)

    // build, append, and delete each committed a version: current = 2
    val d1 = VectorIndex.describe(s, path).head()
    assert(d1.getAs[Long]("version") == 2L)
    assert(d1.getAs[Long]("raw_items") == 120L)
    assert(d1.getAs[Long]("live_items") == 110L)
    assert(d1.getAs[Int]("batch_partitions") == 2) // build + one append
    assert(d1.getAs[Int]("retained_versions") == 3)
    assert(d1.getAs[Long]("pending_tombstones") == 10L)
    assert(d1.getAs[Long]("payload_bytes") > 0L)

    VectorIndex.compact(s, path)
    val d2 = VectorIndex.describe(s, path).head()
    assert(d2.getAs[Long]("version") == 3L)
    assert(d2.getAs[Int]("retained_versions") == 4)
    assert(d2.getAs[Long]("raw_items") == 110L)
    assert(d2.getAs[Long]("live_items") == 110L)
    assert(d2.getAs[Long]("pending_tombstones") == 0L)
  }

  test("repeated compacts chain versions; vacuum keep=2 retains the last two") {
    val path = Files.createTempDirectory("manifest_chain").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 1), "vec_id", path) // v1
    VectorIndex.compact(s, path) // v2
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 2), "vec_id", path) // v3
    VectorIndex.compact(s, path) // v4
    assert(IndexManifest.currentVersion(s, path).contains(4L))
    // keep=2 retains v3+v4; v3 resolves to payload codes_v2, so the
    // reclaim cutoff is 2 — only the v0/v1 generation goes
    VectorIndex.vacuum(s, path, keep = 2)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes_v0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes_v2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes_v4")))
    val n = emb.count()
    assert(VectorIndex.loadBinaryCodes(s, path).count() == n - 2)
  }

  test("rebuild into a compacted index commits the NEXT version, not a dead v0") {
    val path = Files.createTempDirectory("manifest_rebuild").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 5), "vec_id", path) // v1
    VectorIndex.compact(s, path) // current = v2
    // rebuild from a DIFFERENT corpus slice: before the versioned-build
    // fix this wrote codes_v0 + committed 0, which currentVersion's max
    // rule silently ignored — readers kept serving the old payload
    VectorIndex.buildBinary(emb.filter(col("vec_id") >= 100),
      "vec_id", "embedding", path)
    assert(IndexManifest.currentVersion(s, path).contains(3L))
    val live = VectorIndex.loadBinaryCodes(s, path)
    val expect = emb.filter(col("vec_id") >= 100).count()
    assert(live.count() == expect, "rebuild must serve the new corpus")
    assert(live.filter(col("vec_id") < 100).count() == 0)
    // the old version's tombstones do not leak into the rebuilt index
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
  }

  test("a delete landing during compact's rewrite is carried forward, not lost") {
    val path = Files.createTempDirectory("manifest_race").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 1), "vec_id", path) // v1
    // inject the race: a delete committing between compact's tombstone
    // snapshot and its marker — it steals version 2, compact's optimistic
    // loop re-snapshots (now seeing BOTH segments) and commits v3
    VectorIndex.compactWithHook(s, path, () =>
      VectorIndex.deleteIds(emb.filter(col("vec_id") === 2), "vec_id", path))
    assert(IndexManifest.currentVersion(s, path).contains(3L))
    // the racing delete was folded by the retry, not lost: the compacted
    // payload holds neither id and no tombstones remain pending
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
    assert(VectorIndex.loadBinaryCodes(s, path)
      .filter(col("vec_id").isin(1, 2)).count() == 0)
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 98)
    // a reader pinned to the stolen version 2 sees the racing delete
    // exactly once it committed — and nothing of the later compact
    assert(VectorIndex.loadCodesAt(s, path, 2L).count() == 98)
    // compact again: nothing pending, a clean no-op
    VectorIndex.compact(s, path)
    assert(IndexManifest.currentVersion(s, path).contains(3L))
  }

  test("post-compact appends land in the current version and survive the next compact") {
    val path = Files.createTempDirectory("manifest_append").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 5), "vec_id", path)
    VectorIndex.compact(s, path) // v1
    VectorIndex.appendBinary(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 110),
      "vec_id", "embedding", path)
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 99 + 10)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 100), "vec_id", path)
    VectorIndex.compact(s, path) // v2 — must carry the appended batch
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 99 + 10 - 1)
    assert(VectorIndex.loadBinaryCodes(s, path)
      .filter(col("vec_id") === 105).count() == 1)
  }

  test("pointer+probe head resolution: skipped numbers get gap " +
    "advisories, the checkpoint sweep bumps the fence, and the fast " +
    "head never under-reports across any of it") {
    import graft.operators.TableManifest
    val path = Files.createTempDirectory("manifest_gaps").toString
    TableManifest.commitSnapshot(
      s.range(5).select(col("id"), col("id").cast("double").as("v")),
      path) // v0
    TableManifest.append(s.range(5, 6).select(col("id"),
      col("id").cast("double").as("v")), path) // v1
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def mexists(n: String) = f.exists(
      new org.apache.hadoop.fs.Path(s"$path/manifest/$n"))
    // a committer skipping numbers (the lost-race-backout shape) must
    // leave the g-trail so probers can cross the gap
    assert(IndexManifest.tryCommitTagged(s, path, 4L, 10L, -1L, "append"))
    assert(mexists("g2") && mexists("g3"),
      "skipped numbers need gap advisories")
    assert(IndexManifest.currentVersion(s, path).contains(4L))
    // checkpoint: pointer written, dead advisories swept WITH a fence
    // bump (a prober mid-walk on the old pointer must refuse rather
    // than stop at the swept gap)
    TableManifest.checkpointManifest(s, path)
    assert(mexists("_last_ckpt"))
    assert(!mexists("g2") && !mexists("g3"),
      "dead advisories are swept at checkpoint")
    assert(mexists("_fence"), "the sweep must bump the fence")
    assert(IndexManifest.currentVersion(s, path).contains(4L))
    assert(IndexManifest.committedVersions(s, path) == Seq(0L, 1L, 4L))
    // new commits above the checkpoint are found by probing, and a
    // fresh gap above it keeps its advisory until the next checkpoint
    assert(IndexManifest.tryCommitTagged(s, path, 6L, 11L, -1L, "append"))
    assert(mexists("g5"))
    assert(IndexManifest.currentVersion(s, path).contains(6L))
    assert(IndexManifest.committedVersions(s, path) ==
      Seq(0L, 1L, 4L, 6L))
    // the full listing agrees with the probed view
    assert(IndexManifest.markerLog(s, path).committed ==
      Seq(0L, 1L, 4L, 6L))
  }
}
