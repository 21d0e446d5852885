package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Persisted sign-LSH index: saved-key search equals the in-memory
  * multi-probe path, appends hash under the saved plane count with
  * exactly-once keyed replay. (Delete/compact are oracle-gated by
  * q_signlsh_index.) */
class SignLshIndexSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("persisted path validates probes like the in-memory path") {
    val path = Files.createTempDirectory("signlsh_probes").toString
    VectorIndex.buildSignLsh(emb, "vec_id", "embedding", path)
    val q = emb.filter(col("vec_id") < 3)
    for (bad <- Seq(0, 17, -1))
      assertThrows[IllegalArgumentException] {
        VectorIndex.searchSignLsh(s, path, emb, "vec_id", "embedding",
          q, k = 3, probes = bad).collect()
      }
  }

  test("saved-key search equals in-memory multi-probe; keyed replay is exactly-once") {
    val path = Files.createTempDirectory("signlsh_spec").toString
    val queries = emb.filter(col("vec_id") < 10).localCheckpoint(true)
    VectorIndex.buildSignLsh(emb, "vec_id", "embedding", path)
    val fromIndex = VectorIndex.searchSignLsh(s, path, emb,
        "vec_id", "embedding", queries, k = 3, probes = 4)
      .collect().map(_.toSeq).toSet
    val inMemory = Knn.multiProbeSearch(emb, queries,
        "vec_id", "embedding", k = 3, probes = 4)
      .collect().map(_.toSeq).toSet
    assert(fromIndex == inMemory,
      "the persisted index must lose nothing vs the in-memory path")

    // exact clones of the queries appended under shifted ids: same
    // vector ⇒ same saved-plane bucket ⇒ each query finds its clone at
    // sim_ppm ≥ 999999 after ONE append (a replayed keyed append must
    // not double the keys)
    val clones = queries.withColumn("vec_id", col("vec_id") + 5000L)
      .localCheckpoint(true)
    val n0 = VectorIndex.loadSignLshKeys(s, path).count()
    VectorIndex.appendSignLsh(clones, "vec_id", "embedding", path,
      batchId = Some(0L))
    VectorIndex.appendSignLsh(clones, "vec_id", "embedding", path,
      batchId = Some(0L))
    assert(VectorIndex.loadSignLshKeys(s, path).count() == n0 + 10)
    val after = VectorIndex.searchSignLsh(s, path,
        emb.unionByName(clones), "vec_id", "embedding", queries,
        k = 3, probes = 4)
      .filter(col("neighbor_id") >= 5000L && col("rank") === 1)
    assert(after.count() == 10,
      "every query's appended exact clone must be its top hit")
  }

  test("searchSignLshAt: a pinned probe uses the PINNED plane geometry across a rebuild") {
    val path = Files.createTempDirectory("signlsh_tt").toString
    val corpus0 = emb.filter(col("vec_id") < 200).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint(true)
    VectorIndex.buildSignLsh(corpus0, "vec_id", "embedding", path)
    val v0 = VectorIndex.versions(s, path).last
    val planes0 = s.read.parquet(s"$path/meta_v$v0").head().getAs[Int]("planes")
    val pinned = VectorIndex.searchSignLshAt(s, path, v0, corpus0,
        "vec_id", "embedding", queries, k = 3, probes = 4)
      .collect().map(_.toSeq).toSet
    // rebuild over a corpus big enough to derive a DIFFERENT plane count:
    // bucket keys are only comparable within one plane family, so a
    // pinned probe that read the new geometry would silently miss
    VectorIndex.buildSignLsh(emb, "vec_id", "embedding", path)
    val v1 = VectorIndex.versions(s, path).last
    val planes1 = s.read.parquet(
        IndexManifest.artifactDirAt(s, path, "meta", Some(v1)))
      .head().getAs[Int]("planes")
    assert(planes0 != planes1,
      s"fixture must change geometry across the rebuild: $planes0 vs $planes1")
    assert(VectorIndex.searchSignLshAt(s, path, v0, corpus0,
        "vec_id", "embedding", queries, k = 3, probes = 4)
      .collect().map(_.toSeq).toSet == pinned,
      "the pin must keep its own plane family and key table")
    // and the current probe equals the in-memory path over the new corpus
    assert(VectorIndex.searchSignLsh(s, path, emb, "vec_id", "embedding",
        queries, k = 3, probes = 4).collect().map(_.toSeq).toSet ==
      Knn.multiProbeSearch(emb, queries, "vec_id", "embedding",
        k = 3, probes = 4).collect().map(_.toSeq).toSet)
  }
}
