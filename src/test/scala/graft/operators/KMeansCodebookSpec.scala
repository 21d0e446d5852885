package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production PQ quantizer's contracts: deterministic across reruns,
  * schema-compatible with every codebook consumer, strictly tighter
  * quantization than the label-mean stand-in, and lifecycle-compatible
  * with the persisted IVF-PQ index (build with k-means codebooks → load
  * → search equals the in-memory search). */
class KMeansCodebookSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("deterministic: two fits produce identical codebooks") {
    def fit() = PQ.kmeansCodebook(emb, "vec_id", "embedding", 8, 8, 8, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .toSet
    assert(fit() == fit())
  }

  test("k-means codes tighten quantization error vs the label-mean codebook") {
    def totalErr(cb: Option[org.apache.spark.sql.DataFrame]): Long =
      PQ.encode(emb, "vec_id", "embedding", "label", 8, 8, cb)
        .agg(sum(col("err_ppm"))).head().getLong(0)
    val labelErr = totalErr(None)
    val kmeansErr = totalErr(Some(
      PQ.kmeansCodebook(emb, "vec_id", "embedding", 8, 8, 16, 2)))
    assert(kmeansErr < labelErr,
      s"k-means (16 codewords) must beat label means: $kmeansErr vs $labelErr")
  }

  test("Lloyd rounds monotonically reduce quantization error") {
    def errAt(iters: Int): Long =
      PQ.encode(emb, "vec_id", "embedding", "label", 8, 8,
          Some(PQ.kmeansCodebook(emb, "vec_id", "embedding", 8, 8, 8, iters)))
        .agg(sum(col("err_ppm"))).head().getLong(0)
    val e0 = errAt(0); val e1 = errAt(1); val e3 = errAt(3)
    assert(e1 <= e0 && e3 <= e1, s"Lloyd must not regress: $e0, $e1, $e3")
  }

  test("persisted IVF-PQ index built with k-means codebooks round-trips") {
    val path = java.nio.file.Files
      .createTempDirectory("ivfpq_kmeans_idx").toString
    val fitter = (r: org.apache.spark.sql.DataFrame) =>
      PQ.kmeansCodebook(r, "vec_id", "__r", 8, 8, 8, 2)
    VectorIndex.buildIvfPq(emb, "vec_id", "embedding", "label", path, 8, 8,
      residCodebook = Some(fitter))
    val direct = {
      val (cents, rcw, codes) = PQ.ivfPqTrain(
        emb, "vec_id", "embedding", "label", 8, 8, Some(fitter))
      PQ.ivfPqProbeSearch(cents, rcw, codes, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nProbe = 2, subspaces = 8, subDim = 8)
    }
    val loaded = VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5, nProbe = 2)
    assert(loaded.collect().toSet == direct.collect().toSet)
    // and the saved codebooks really are the k-means fit (8 codewords per
    // subspace, labeled 0..7 — not the |lists| label-mean layout)
    val labels = VectorIndex.loadIvfPqCodebooks(s, path)
      .select(col("c_label")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(labels == (0L until 8L).toSet)
  }
}
