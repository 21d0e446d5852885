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
