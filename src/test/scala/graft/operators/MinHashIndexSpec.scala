package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Persisted MinHash signature index: probe/append/delete on the shared
  * storage contract, geometry pinned in meta, exactly-once keyed append. */
class MinHashIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def docs = Tables.documents(s, "/root/testdata/sf0.001")

  test("an exact text duplicate probes at est 1.0; clean docs verdict 0") {
    val path = Files.createTempDirectory("mhidx_spec").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 100), "doc_id", "text", path)

    // clone standing doc 3's text under a new id → signature identical →
    // every band collides → est_ppm = 1e6
    val clone = docs.filter(col("doc_id") === 3)
      .select(lit(7777L).as("doc_id"), col("text"))
    val hit = MinHashIndex.probe(clone, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hit.exists { case (p, r, est) => p == 7777L && r == 3L && est == 1000000L })

    // a batch with the clone and a fresh doc: verdict 1+ vs verdict 0
    val wave = clone.unionByName(
      docs.filter(col("doc_id") === 450).select(col("doc_id"), col("text")))
    val v = MinHashIndex.verdicts(wave, "doc_id", "text", path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v(7777L) >= 1L)
    assert(v.contains(450L)) // every probe doc gets a row, clean or not
  }

  test("append signs under the SAVED geometry; probe then matches the appended doc") {
    val path = Files.createTempDirectory("mhidx_geom").toString
    // non-default geometry: k=32, shingle=4 — meta must carry it
    MinHashIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text",
      path, k = 32, shingle = 4)
    MinHashIndex.append(
      docs.filter(col("doc_id") === 200).select(col("doc_id"), col("text")),
      "doc_id", "text", path)
    // probing doc 200's own text (new id) must find the appended entry at
    // est 1.0 — only possible if append signed with the saved k/shingle
    val probe = docs.filter(col("doc_id") === 200)
      .select(lit(9999L).as("doc_id"), col("text"))
    val hit = MinHashIndex.probe(probe, "doc_id", "text", path, bands = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(hit.contains((200L, 1000000L)))
  }

  test("est_ppm is exact when k does not divide 1e6 (k=48 clone probes at 1000000)") {
    val path = Files.createTempDirectory("mhidx_k48").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text",
      path, k = 48, shingle = 3)
    val clone = docs.filter(col("doc_id") === 3)
      .select(lit(7777L).as("doc_id"), col("text"))
    // truncating (1e6/48)=20833 per match would cap the estimate at
    // 999984 ppm; multiply-then-divide restores the exact 1e6
    val hit = MinHashIndex.probe(clone, "doc_id", "text", path, bands = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(hit.contains((3L, 1000000L)))
  }

  test("rebuild under NEW geometry atomically replaces a compacted index") {
    val path = Files.createTempDirectory("mhidx_rebuild").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text", path)
    VectorIndex.deleteIds(docs.filter(col("doc_id") === 3), "doc_id", path)
    VectorIndex.compact(s, path) // delete = v1, compact = v2
    // rebuild with different k/shingle over a different corpus slice:
    // pre-fix this left readers on the v1 signatures while meta claimed
    // the new geometry — silently wrong probes
    MinHashIndex.build(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 150),
      "doc_id", "text", path, k = 32, shingle = 4)
    assert(IndexManifest.currentVersion(s, path).contains(3L))
    val clone = docs.filter(col("doc_id") === 120)
      .select(lit(8888L).as("doc_id"), col("text"))
    val hit = MinHashIndex.probe(clone, "doc_id", "text", path, bands = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(hit.contains((120L, 1000000L)),
      "probe must sign under the rebuilt geometry and hit the new corpus")
    // nothing from the old build is served
    assert(MinHashIndex.load(s, path)
      .filter(col("vec_id") < 100).count() == 0)
  }

  test("tombstoned ids stop matching; keyed append replay is exactly-once") {
    val path = Files.createTempDirectory("mhidx_del").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 100), "doc_id", "text", path)
    val clone = docs.filter(col("doc_id") === 3)
      .select(lit(7777L).as("doc_id"), col("text"))
    VectorIndex.deleteIds(docs.filter(col("doc_id") === 3), "doc_id", path)
    val hits = MinHashIndex.probe(clone, "doc_id", "text", path)
      .collect().map(_.getLong(1)).toSet
    assert(!hits.contains(3L), "a tombstoned standing doc must not match")

    val n0 = MinHashIndex.load(s, path).count()
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .select(col("doc_id"), col("text"))
    MinHashIndex.append(batch, "doc_id", "text", path, batchId = Some(0L))
    MinHashIndex.append(batch, "doc_id", "text", path, batchId = Some(0L))
    assert(MinHashIndex.load(s, path).count() == n0 + 20,
      "a replayed keyed append must overwrite its partition, not double it")
  }
}
