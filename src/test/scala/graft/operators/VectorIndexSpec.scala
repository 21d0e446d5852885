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

  test("filtered search: exact among allowed, composes with tombstones") {
    val path = Files.createTempDirectory("vindex_filt").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    val allowed = emb.filter(col("label").isin(3, 4)).select(col("vec_id"))
    // the ground truth: the same coarse+rerank over the pre-restricted
    // coded corpus (queries unfiltered) — pre-filter semantics exactly
    def direct(liveIds: org.apache.spark.sql.DataFrame) = {
      val thr = BinaryQuant.fitThresholds(emb, "embedding")
      val coded = BinaryQuant.withCode(emb, "embedding", thr)
        .join(liveIds, Seq("vec_id"), "left_semi")
      BinaryQuant.hammingRerankTopK(
        coded.join(allowed, Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", coded.filter(col("vec_id") < 8),
        k = 3, rerankWidth = 16)
    }
    def filtered() = VectorIndex.searchBinaryFiltered(s, path, emb,
      "vec_id", "embedding", _.filter(col("vec_id") < 8),
      k = 3, rerankWidth = 16, allowed = allowed)
    assert(filtered().collect().toSet ==
      direct(emb.select(col("vec_id"))).collect().toSet)
    // every neighbor satisfies the predicate; post-filtering an
    // unfiltered top-16 would NOT reach 3 allowed rows for every query
    val labels = filtered()
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
    assert(labels.filter(!col("label").isin(3, 4)).count() == 0)
    // tombstones compose: deleted ids vanish from candidates AND queries
    VectorIndex.deleteIds(emb.filter(col("vec_id") % 4 === 1), "vec_id",
      path)
    assert(filtered().collect().toSet ==
      direct(emb.filter(col("vec_id") % 4 =!= 1).select(col("vec_id")))
        .collect().toSet)
  }

  test("streaming ingestion: foreachBatch appends drops into the index") {
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("vindex_stream_src").toString
    val path = Files.createTempDirectory("vindex_stream").toString
    // index built on an initial corpus; the stream delivers later drops
    val first = emb.filter(col("vec_id") < 300)
    VectorIndex.buildBinary(first, "vec_id", "embedding", path)
    emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val q = s.readStream.schema(schema).parquet(srcDir)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          VectorIndex.appendBinary(batch, "vec_id", "embedding", path)
          ()
      }.start()
    try {
      q.processAllAvailable()
      assert(VectorIndex.loadBinaryCodes(s, path).count() == 400)
      // a second micro-batch lands incrementally
      emb.filter(col("vec_id") >= 400)
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(VectorIndex.loadBinaryCodes(s, path).count() == emb.count())
    } finally q.stop()
    // the streamed index equals a batch build with the SAME thresholds
    val thrFirst = BinaryQuant.fitThresholds(first, "embedding")
    val expected = BinaryQuant.withCode(emb, "embedding", thrFirst)
      .select(col("vec_id"), col("code"))
    assert(VectorIndex.loadBinaryCodes(s, path).collect().toSet ==
      expected.collect().toSet)
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
