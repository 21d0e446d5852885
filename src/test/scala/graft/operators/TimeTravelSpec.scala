package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** VERSION AS OF reads over the manifest layer: a superseded version
  * keeps serving its stable live view until vacuum, searches pin to it,
  * and history() audits what is retained. */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("loadCodesAt serves each version's stable view across compact and append") {
    val path = Files.createTempDirectory("tt_spec").toString
    val base = emb.filter(col("vec_id") < 100)
    VectorIndex.buildBinary(base, "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") % 7 === 0), "vec_id", path)
    val nDel = base.filter(col("vec_id") % 7 === 0).count()
    VectorIndex.compact(s, path) // v2
    VectorIndex.appendBinary(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 110),
      "vec_id", "embedding", path) // commits v3
    assert(VectorIndex.versions(s, path) == Seq(0L, 1L, 2L, 3L))
    // v0 predates the delete: the FULL build, no later mutation visible
    assert(VectorIndex.loadCodesAt(s, path, 0L).count() == 100)
    assert(VectorIndex.loadCodesAt(s, path, 0L)
      .filter(col("vec_id") >= 100).count() == 0)
    // v1 = the delete's snapshot; v2 = the compacted equal view
    assert(VectorIndex.loadCodesAt(s, path, 1L).count() == 100 - nDel)
    assert(VectorIndex.loadCodesAt(s, path, 2L).count() == 100 - nDel)
    // v3 = compacted + the append
    assert(VectorIndex.loadCodesAt(s, path, 3L).count() == 100 - nDel + 10)
    // current loader agrees with the pinned-current read
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 100 - nDel + 10)
  }

  test("searchBinaryAt pins results to the snapshot (pre-append vs current)") {
    val path = Files.createTempDirectory("tt_search").toString
    val base = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    VectorIndex.buildBinary(base, "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 5), "vec_id", path)
    VectorIndex.compact(s, path) // v2
    def q(df: org.apache.spark.sql.DataFrame) = df.filter(col("vec_id") < 5)
    val atV0 = VectorIndex.searchBinaryAt(s, path, 0L, base,
      "vec_id", "embedding", q, k = 3, rerankWidth = 16)
      .collect().map(_.toSeq).toSet
    // clones of the base under shifted ids enter ONLY the current version
    val clones = base.withColumn("vec_id", col("vec_id") + 5000L)
    VectorIndex.appendBinary(clones, "vec_id", "embedding", path)
    val all = base.unionByName(clones)
    val atV0After = VectorIndex.searchBinaryAt(s, path, 0L, all,
      "vec_id", "embedding", q, k = 3, rerankWidth = 16)
      .collect().map(_.toSeq).toSet
    val current = VectorIndex.searchBinary(s, path, all,
      "vec_id", "embedding", q, k = 3, rerankWidth = 16)
      .collect().map(_.toSeq).toSet
    assert(atV0After == atV0,
      "the pinned snapshot must not see the later append")
    // every query vector's exact clone is its top hamming-0 hit now
    assert(current != atV0,
      "the current view must see the appended clones")
    assert(current.exists(_.exists { case id: Long => id >= 5000L; case _ => false }))
  }

  test("rebuild: old version keeps the old corpus, current serves the new") {
    val path = Files.createTempDirectory("tt_rebuild").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 50),
      "vec_id", "embedding", path) // v0
    VectorIndex.buildBinary(emb.filter(col("vec_id") >= 200),
      "vec_id", "embedding", path) // v1 (rebuild)
    assert(VectorIndex.loadCodesAt(s, path, 0L)
      .agg(max(col("vec_id"))).head().getLong(0) < 50L)
    assert(VectorIndex.loadCodesAt(s, path, 1L)
      .agg(min(col("vec_id"))).head().getLong(0) >= 200L)
  }

  test("maintain applies the retention policy: compacts past the ratio, vacuums to keep") {
    val path = Files.createTempDirectory("tt_maint").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    // 5 tombstones over 95 live = 5.3% — below the 10% default: no-op
    VectorIndex.deleteIds(emb.filter(col("vec_id") < 5), "vec_id", path)
    val r1 = VectorIndex.maintain(s, path).head()
    assert(!r1.getAs[Boolean]("compacted"))
    assert(VectorIndex.loadTombstones(s, path).count() == 5)
    // 15 over 85 = 17.6% — compacts, then vacuums to keep=2 (both fit)
    VectorIndex.deleteIds(emb.filter(col("vec_id") < 15), "vec_id", path) // v2
    val r2 = VectorIndex.maintain(s, path).head()
    assert(r2.getAs[Boolean]("compacted"))
    assert(r2.getAs[Long]("current_version") == 3L)
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
    // keep=2 retains v2+v3; v2 still resolves to payload codes_v0, so
    // the whole chain survives this pass
    assert(VectorIndex.versions(s, path) == Seq(0L, 1L, 2L, 3L))
    // a keep=1 pass reclaims everything below the compacted payload —
    // EXCEPT v0's marker: thresholds_v0 still serves every retained
    // version (compact writes no geometry), and resolution requires a
    // committed marker, so the marker travels with the retained artifact
    val r3 = VectorIndex.maintain(s, path, keepVersions = 1).head()
    assert(!r3.getAs[Boolean]("compacted"))
    assert(r3.getAs[Int]("vacuumed_versions") == 2)
    assert(VectorIndex.versions(s, path) == Seq(0L, 3L))
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 85)
    // the retained geometry must still RESOLVE: a post-vacuum append
    // encodes under the kept thresholds and a search serves — the
    // regression where vacuum stranded live geometry behind a deleted
    // marker (probes fell back to a legacy path that never existed)
    VectorIndex.appendBinary(emb.filter(col("vec_id") === 200),
      "vec_id", "embedding", path)
    assert(VectorIndex.searchBinary(s, path, emb, "vec_id", "embedding",
      _.filter(col("vec_id") === 200), k = 3, rerankWidth = 8).count() == 3)
    // v0 itself stays fail-fast: its payload is gone, only its marker
    // (as geometry anchor) remains
    assertThrows[IllegalArgumentException] {
      VectorIndex.loadCodesAt(s, path, 0L)
    }
  }

  test("history audits retained versions; vacuumed and bogus versions fail fast") {
    val path = Files.createTempDirectory("tt_hist").toString
    VectorIndex.buildBinary(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    VectorIndex.deleteIds(emb.filter(col("vec_id") < 10), "vec_id", path)
    VectorIndex.compact(s, path)
    val h = VectorIndex.history(s, path).orderBy(col("version")).collect()
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(0L, 1L, 2L))
    assert(h.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    assert(h.forall(_.getAs[Boolean]("readable")))
    // v0 predates the delete entirely; v1 masks it; v2 folded it
    assert(h.map(_.getAs[Long]("live_items")).toSeq == Seq(100L, 90L, 90L))
    assert(h.map(_.getAs[Long]("pending_tombstones")).toSeq ==
      Seq(0L, 10L, 0L))
    intercept[IllegalArgumentException] {
      VectorIndex.loadCodesAt(s, path, 7L)
    }
    VectorIndex.vacuum(s, path, keep = 1)
    // v1's marker went with its payload; v0's marker STAYS because
    // thresholds_v0 still serves the retained chain (marker-with-
    // geometry retention) — its payload is gone, so it reads as a
    // fail-fast non-resolvable version, and history shows it unreadable
    assert(VectorIndex.versions(s, path) == Seq(0L, 2L))
    intercept[IllegalArgumentException] {
      VectorIndex.loadCodesAt(s, path, 0L)
    }
    val h2 = VectorIndex.history(s, path).orderBy(col("version")).collect()
    assert(h2.map(r => (r.getAs[Long]("version"),
      r.getAs[Boolean]("readable"))).toSeq == Seq(0L -> false, 2L -> true))
  }
}
