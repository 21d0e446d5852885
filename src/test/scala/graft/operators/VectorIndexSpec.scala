package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VectorIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("build → save → load → search equals the in-memory search") {
    val path = Files.createTempDirectory("vindex").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)

    val direct = {
      val thr = BinaryQuant.fitThresholds(emb, "embedding")
      val coded = BinaryQuant.withCode(emb, "embedding", thr)
      BinaryQuant.hammingRerankTopK(coded, "vec_id", "embedding",
        coded.filter(col("vec_id") < 5), k = 3, rerankWidth = 16)
    }
    val loaded = VectorIndex.searchBinary(s, path, emb, "vec_id", "embedding",
      _.filter(col("vec_id") < 5), k = 3, rerankWidth = 16)
    assert(loaded.collect().toSet == direct.collect().toSet)
  }

  test("append encodes under the SAVED thresholds, never refits") {
    val path = Files.createTempDirectory("vindex_app").toString
    val first = emb.filter(col("vec_id") < 400)
    val second = emb.filter(col("vec_id") >= 400)
    VectorIndex.buildBinary(first, "vec_id", "embedding", path)
    VectorIndex.appendBinary(second, "vec_id", "embedding", path)

    val appended = VectorIndex.loadBinaryCodes(s, path)
    assert(appended.count() == emb.count())
    // codes of the appended half must equal encoding under the FIRST
    // half's thresholds — not a refit over the union (which would shift
    // thresholds and silently re-map bits under the standing codes)
    val thrFirst = BinaryQuant.fitThresholds(first, "embedding")
    val expected = BinaryQuant.withCode(second, "embedding", thrFirst)
      .select(col("vec_id"), col("code"))
    assert(appended.filter(col("vec_id") >= 400).collect().toSet ==
      expected.collect().toSet)
    // and a refit over the union would genuinely differ (guards the test)
    val thrUnion = BinaryQuant.fitThresholds(emb, "embedding")
    val refit = BinaryQuant.withCode(second, "embedding", thrUnion)
      .select(col("vec_id"), col("code"))
    assert(refit.collect().toSet != expected.collect().toSet,
      "refit thresholds should differ for this corpus split")
  }
}
