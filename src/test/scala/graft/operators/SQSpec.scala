package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: code arithmetic on crafted vectors (range
  * ends, clamping, degenerate dims) and distance exactness. */
class SQSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  test("codes: range endpoints map to 0/255, degenerate dim to 0") {
    val emb = Seq(
      (1L, Array(0.0f, 5.0f, 7.0f)),
      (2L, Array(10.0f, 5.0f, 3.0f)),
      (3L, Array(5.0f, 5.0f, 5.0f))).toDF("vec_id", "embedding")
    val fit = SQ.fitMinMax(emb, "embedding")
    val codes = SQ.withCodes(emb, "embedding", fit)
      .select(col("vec_id"), col("qcode"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim 0 spans [0,10]: 0→0, 10→255, 5→floor(5*25.5)=127
    assert(codes(1L)(0) == 0 && codes(2L)(0) == 255 && codes(3L)(0) == 127)
    // dim 1 is degenerate (all 5.0) → 0 everywhere, no div-by-zero
    assert(Seq(1L, 2L, 3L).forall(id => codes(id)(1) == 0))
    // dim 2 spans [3,7]: 3→0, 7→255, 5→floor(2*63.75)=127
    assert(codes(2L)(2) == 0 && codes(1L)(2) == 255 && codes(3L)(2) == 127)
  }

  test("persisted SQ8 index: append under the saved fit, tombstone, compact") {
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("sq8idx").toString
    VectorIndex.buildSq8(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", path)
    // append encodes under the SAVED range — probing an appended vector's
    // own embedding must return it at distance 0 (same fit ⇒ same code)
    VectorIndex.appendSq8(emb.filter(col("vec_id") === 200),
      "vec_id", "embedding", path)
    val hit = VectorIndex.searchSq8(s, path,
        emb.filter(col("vec_id") === 200)
          .withColumn("vec_id", lit(9999L)),
        "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(hit.toSeq == Seq((200L, 0L)))

    // shared lifecycle machinery: tombstone + compact work unchanged
    VectorIndex.deleteIds(emb.filter(col("vec_id") === 200), "vec_id", path)
    val afterDel = VectorIndex.searchSq8(s, path,
        emb.filter(col("vec_id") === 200)
          .withColumn("vec_id", lit(9999L)),
        "vec_id", "embedding", k = 1)
      .collect().map(_.getLong(1))
    assert(!afterDel.contains(200L))
    VectorIndex.compact(s, path)
    assert(VectorIndex.loadSq8Codes(s, path).count() == 100)
  }

  test("search: exact integer distances, self excluded, deterministic ties") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val fit = SQ.fitMinMax(emb, "embedding")
    val coded = SQ.withCodes(emb, "embedding", fit)
    val res = SQ.searchTopK(coded, "vec_id", "qcode",
        coded.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // codes: 0→(0,0), 1→(255,0), 2→(0,255), 3→(255,255)
    // dists from 0: 1 and 2 at 255², 3 at 2·255²; tie broken by id
    assert(res.toSeq == Seq((1L, 65025L, 1), (2L, 65025L, 2), (3L, 130050L, 3)))
  }
  test("searchSq8At: a pinned probe uses the PINNED fit across a rebuild") {
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("sq8_tt").toString
    val corpus0 = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 3).localCheckpoint(true)
    VectorIndex.buildSq8(corpus0, "vec_id", "embedding", path)
    val v0 = VectorIndex.versions(s, path).last
    val pinned = VectorIndex.searchSq8At(s, path, v0, queries,
        "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    // rebuild over a DIFFERENT slice: new min/max fit, new codes — the
    // pin must keep encoding queries under ITS fit against ITS codes
    VectorIndex.buildSq8(emb.filter(col("vec_id") >= 50),
      "vec_id", "embedding", path)
    assert(VectorIndex.searchSq8At(s, path, v0, queries,
        "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet == pinned,
      "a rebuild's fit must never reach a pinned SQ8 probe")
  }
}
