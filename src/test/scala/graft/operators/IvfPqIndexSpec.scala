package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Lifecycle of the persisted IVF-PQ index (build → save → load → search
  * → append): the composed-quantizer analog of VectorIndexSpec. The
  * invariants locked here are the faiss contract — search over loaded
  * artifacts equals the in-memory search, and append encodes under the
  * SAVED quantizer (nearest-centroid assignment, residual codes from the
  * saved codebooks) without ever rewriting centroids or codebooks. */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("build → save → load → search equals the in-memory IVF-PQ search") {
    val path = Files.createTempDirectory("ivfpq_idx").toString
    VectorIndex.buildIvfPq(emb, "vec_id", "embedding", "label", path, 8, 8)
    val direct = PQ.ivfPqSearch(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", "label", k = 5, nProbe = 2,
      subspaces = 8, subDim = 8)
    val loaded = VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5, nProbe = 2)
    assert(loaded.collect().toSet == direct.collect().toSet)
  }

  test("streaming ingestion: foreachBatch appends drops under the saved quantizer") {
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("ivfpq_stream_src").toString
    val path = Files.createTempDirectory("ivfpq_stream").toString
    val n = emb.count()
    // quantizer trained on the FIRST HALF of the corpus, index built from
    // it; the stream only APPENDS the second half — so the streamed index
    // must equal a BATCH append of the same drop under the same
    // half-trained quantizer (same quantizer ⇒ same codes, whatever the
    // batching). The foreachBatch batchId is passed through, so a
    // replayed batch would overwrite its own partition (exactly-once —
    // replay idempotence itself is locked by the test below).
    VectorIndex.buildIvfPq(
      emb.filter(col("vec_id") < n / 2), "vec_id", "embedding", "label",
      path, 8, 8)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    emb.filter(col("vec_id") >= n / 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q = s.readStream.schema(schema).parquet(srcDir)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            bid: Long) =>
          VectorIndex.appendIvfPq(batch, "vec_id", "embedding", path,
            batchId = Some(bid))
          ()
      }.start()
    try {
      q.processAllAvailable()
      assert(VectorIndex.loadIvfPqCodes(s, path).count() == n * 8)
    } finally q.stop()
    // and the streamed index is indistinguishable from a BATCH append of
    // the same drop under the same quantizer: full codes tables equal
    val path2 = Files.createTempDirectory("ivfpq_batch").toString
    VectorIndex.buildIvfPq(
      emb.filter(col("vec_id") < n / 2), "vec_id", "embedding", "label",
      path2, 8, 8)
    VectorIndex.appendIvfPq(
      emb.filter(col("vec_id") >= n / 2), "vec_id", "embedding", path2)
    val streamed = VectorIndex.loadIvfPqCodes(s, path)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    val batch = VectorIndex.loadIvfPqCodes(s, path2)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(streamed == batch,
      "streamed appends must equal a batch append under the same quantizer")
  }

  test("replayed keyed batch overwrites its own partition: exactly-once") {
    val path = Files.createTempDirectory("ivfpq_replay").toString
    val n = emb.count()
    VectorIndex.buildIvfPq(
      emb.filter(col("vec_id") < n / 2), "vec_id", "embedding", "label",
      path, 8, 8)
    val built = VectorIndex.loadIvfPqCodes(s, path).count()
    val drop = emb.filter(col("vec_id") >= n / 2)
    VectorIndex.appendIvfPq(drop, "vec_id", "embedding", path,
      batchId = Some(0L))
    val after = VectorIndex.loadIvfPqCodes(s, path).count()
    assert(after > built)
    // the at-least-once retry: same batch id, same rows — must be a
    // no-op on the totals (the partition is REPLACED, not appended)
    VectorIndex.appendIvfPq(drop, "vec_id", "embedding", path,
      batchId = Some(0L))
    assert(VectorIndex.loadIvfPqCodes(s, path).count() == after,
      "replaying a keyed batch must not grow the index")
    // batch id 0 must never collide with the build's partition
    assert(VectorIndex.loadIvfPqCodes(s, path).count() == n * 8)
    // a NEW batch id still appends
    val extra = drop.limit(3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    VectorIndex.appendIvfPq(extra, "vec_id", "embedding", path,
      batchId = Some(1L))
    assert(VectorIndex.loadIvfPqCodes(s, path).count() == (n + 3) * 8)
  }

  test("append encodes under the saved quantizer and never refits it") {
    val path = Files.createTempDirectory("ivfpq_append").toString
    VectorIndex.buildIvfPq(emb, "vec_id", "embedding", "label", path, 8, 8)
    val centsBefore = VectorIndex.loadIvfPqCentroids(s, path)
      .collect().map(r => (r.get(0), r.getSeq[Double](1))).toSet
    val cbBefore = VectorIndex.loadIvfPqCodebooks(s, path)
      .collect().map(r => (r.get(0), r.get(1), r.getSeq[Double](2))).toSet
    val n = emb.count()
    val subspaces = 8

    // append a DUPLICATE of vector 3 under a fresh id: deterministic
    // assignment/encode means its list must be the brute nearest saved
    // centroid and its codes must be searchable alongside the originals
    val newId = n + 1000
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(newId).cast("long").as("vec_id"), col("embedding"),
        col("label"))
    VectorIndex.appendIvfPq(dup, "vec_id", "embedding", path)

    // quantizer artifacts byte-identical; only the coded lists grew
    assert(VectorIndex.loadIvfPqCentroids(s, path)
      .collect().map(r => (r.get(0), r.getSeq[Double](1))).toSet
      == centsBefore, "append must not move centroids")
    assert(VectorIndex.loadIvfPqCodebooks(s, path)
      .collect().map(r => (r.get(0), r.get(1), r.getSeq[Double](2))).toSet
      == cbBefore, "append must not retrain codebooks")
    val codes = VectorIndex.loadIvfPqCodes(s, path)
    assert(codes.count() == (n + 1) * subspaces,
      "append adds exactly one code row per subspace")

    // the appended row's home list is the argmin-L2² saved centroid
    val v3 = emb.filter(col("vec_id") === 3)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val bruteList = centsBefore.toSeq.map { case (l, c) =>
      (c.zip(v3).map { case (x, y) => (x - y) * (x - y) }.sum, l)
    }.minBy(_._1)._2
    val storedLists = codes.filter(col("vec_id") === newId)
      .select(col("__list")).distinct().collect().map(_.get(0)).toSeq
    assert(storedLists == Seq(bruteList),
      s"appended vector must join list $bruteList, got $storedLists")

    // and it is searchable: querying with its source vector surfaces the
    // appended duplicate in the top-k. (Its ADC distance is the
    // quantization error of its own residual — small, but NOT provably
    // the set minimum: a reconstruction under the OTHER probed centroid
    // can land closer, so membership is the sound invariant here.)
    val res = VectorIndex.searchIvfPq(s, path, emb.filter(col("vec_id") === 3),
        "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(res.exists(_._1 == newId),
      s"appended duplicate $newId absent from top-k $res")
  }
  test("searchIvfPqAt: a pinned probe resolves the PINNED quantizer across a rebuild") {
    val path = Files.createTempDirectory("ivfpq_tt").toString
    val corpus0 = emb.filter(col("vec_id") < 150).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 3).localCheckpoint(true)
    VectorIndex.buildIvfPq(corpus0, "vec_id", "embedding", "label", path, 8, 8)
    val v0 = VectorIndex.versions(s, path).last
    val pinned = VectorIndex.searchIvfPqAt(s, path, v0, queries,
        "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    // rebuild trains a NEW quantizer (different corpus): centroids,
    // codebooks, and codes all change — the pinned ADC scan must keep
    // decoding its own codes under its own quantizer
    VectorIndex.buildIvfPq(emb.filter(col("vec_id") >= 50),
      "vec_id", "embedding", "label", path, 8, 8)
    assert(VectorIndex.searchIvfPqAt(s, path, v0, queries,
        "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet == pinned,
      "a rebuild's quantizer must never reach a pinned IVF-PQ probe")
  }
}
