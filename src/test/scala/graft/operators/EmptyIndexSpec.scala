package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** An index whose live set has been folded to ZERO rows (delete-all +
  * compact leaves a footerless codes_v dir — no parquet files to infer a
  * schema from) must stay searchable for every kind: the honest answer
  * is an empty result, never a schema-inference crash. The text/Hamming/
  * MinHash/sign-LSH loaders already read with explicit schemas; these
  * lock the binary, SQ8, and IVF-PQ paths. */
class EmptyIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"), col("label"))
    .filter(col("vec_id") < 40)

  private def foldAllAway(path: String): Unit = {
    VectorIndex.deleteIds(emb.select(col("vec_id")), "vec_id", path)
    VectorIndex.compact(s, path)
  }

  test("binary: delete-all + compact → search returns empty, not a crash") {
    val path = Files.createTempDirectory("empty_bin").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    foldAllAway(path)
    assert(VectorIndex.loadBinaryCodes(s, path).count() == 0)
    assert(VectorIndex.searchBinary(s, path, emb, "vec_id", "embedding",
      _.filter(col("vec_id") < 5), k = 3, rerankWidth = 8).count() == 0)
  }

  test("SQ8: delete-all + compact → search returns empty, not a crash") {
    val path = Files.createTempDirectory("empty_sq8").toString
    VectorIndex.buildSq8(emb, "vec_id", "embedding", path)
    foldAllAway(path)
    assert(VectorIndex.loadSq8Codes(s, path).count() == 0)
    assert(VectorIndex.searchSq8(s, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .count() == 0)
  }

  test("IVF-PQ: delete-all + compact → search returns empty, not a crash") {
    val path = Files.createTempDirectory("empty_pq").toString
    VectorIndex.buildIvfPq(emb, "vec_id", "embedding", "label", path,
      subspaces = 8, subDim = 8)
    foldAllAway(path)
    assert(VectorIndex.loadIvfPqCodes(s, path).count() == 0)
    assert(VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, nProbe = 2).count() == 0)
  }
}
