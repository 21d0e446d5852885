package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Delete + compaction lifecycle for both persisted ANN indexes — the
  * faiss remove_ids contract: tombstoned ids vanish from search results
  * immediately (mask path), compaction rewrites codes minus tombstones
  * without changing any search result, and the index stays appendable
  * afterwards. */
class VectorIndexDeleteSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("binary index: tombstoned ids vanish; compaction changes nothing; append still works") {
    val path = Files.createTempDirectory("vidx_del_bin").toString
    val n = emb.count()
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    val deleted = emb.filter(col("vec_id") % 5 === 0)
    val nDeleted = deleted.count()
    VectorIndex.deleteIds(deleted, "vec_id", path)

    def search() = VectorIndex.searchBinary(s, path, emb, "vec_id",
      "embedding", _.filter(col("vec_id") < 12), k = 3, rerankWidth = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val masked = search()
    assert(masked.nonEmpty)
    assert(!masked.exists { case (q, nb, _) => q % 5 == 0 || nb % 5 == 0 },
      "tombstoned ids must appear neither as queries nor as neighbors")

    // physical state pre-compact: codes untouched, tombstones present
    assert(VectorIndex.loadBinaryCodes(s, path).count() == n)
    assert(VectorIndex.loadTombstones(s, path).count() == nDeleted)

    VectorIndex.compact(s, path)
    assert(search() == masked,
      "compaction must not change any search result")
    assert(VectorIndex.loadBinaryCodes(s, path).count() == n - nDeleted,
      "compaction rewrites codes minus the tombstoned ids")
    assert(VectorIndex.loadTombstones(s, path).count() == 0,
      "compaction clears the tombstone log")

    // still appendable after the swap: re-insert one deleted vector
    val back = emb.filter(col("vec_id") === 5)
    VectorIndex.appendBinary(back, "vec_id", "embedding", path)
    assert(VectorIndex.loadBinaryCodes(s, path)
      .filter(col("vec_id") === 5).count() == 1)
  }

  test("IVF-PQ index: tombstones mask search; compaction drops all subspace rows") {
    val path = Files.createTempDirectory("vidx_del_pq").toString
    val subspaces = 8
    val n = emb.count()
    VectorIndex.buildIvfPq(emb, "vec_id", "embedding", "label", path,
      subspaces, 8)
    VectorIndex.deleteIds(emb.filter(col("vec_id") % 5 === 0), "vec_id", path)
    val nDeleted = emb.filter(col("vec_id") % 5 === 0).count()

    def search() = VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") === 3), "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(r => (r.getLong(1), r.getLong(2))).toSet

    val masked = search()
    assert(masked.nonEmpty)
    assert(!masked.exists(_._1 % 5 == 0),
      "tombstoned ids must not surface from the coded lists")

    VectorIndex.compact(s, path)
    assert(search() == masked)
    assert(VectorIndex.loadIvfPqCodes(s, path).count()
      == (n - nDeleted) * subspaces,
      "compaction must drop every subspace row of a deleted vector")
  }

  test("IVF-PQ interleaving: append, delete some of it, append again, compact, search") {
    val path = Files.createTempDirectory("vidx_del_pq_il").toString
    val subspaces = 8
    val base = emb.filter(col("vec_id") < 400)
    VectorIndex.buildIvfPq(base, "vec_id", "embedding", "label", path,
      subspaces, 8)

    // append a drop, then tombstone PART of that very drop plus part of
    // the standing corpus — the interleaving the lifecycle must survive
    val drop1 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    VectorIndex.appendIvfPq(drop1, "vec_id", "embedding", path)
    VectorIndex.deleteIds(
      emb.filter((col("vec_id") >= 440 && col("vec_id") < 450) ||
        col("vec_id") % 50 === 0), "vec_id", path)

    def hits() = VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") === 3), "vec_id", "embedding",
      k = 8, nProbe = 2).collect().map(_.getLong(1)).toSet

    val masked = hits()
    assert(masked.nonEmpty)
    assert(!masked.exists(id => (id >= 440 && id < 450) || id % 50 == 0),
      "deleted appended ids and deleted standing ids must both be masked")

    // compact mid-lifecycle, then append AGAIN — post-compaction appends
    // must land live (tombstone log is clear) while old deletes stay gone
    VectorIndex.compact(s, path)
    assert(hits() == masked, "compaction must not change search results")
    // 451.. not 450: 450 is a tombstoned id, and re-appending a
    // deleted id after compaction legitimately resurrects it (the
    // explicit-re-append contract q_index_delete exercises) - this case
    // checks the opposite: ids NOT re-appended stay gone
    val drop2 = emb.filter(col("vec_id") > 450 && col("vec_id") <= 460)
    VectorIndex.appendIvfPq(drop2, "vec_id", "embedding", path)

    val after = hits()
    assert(!after.exists(id => (id >= 440 && id < 450) || id % 50 == 0),
      "compacted-away ids must not resurrect through the new append")
    val codeIds = VectorIndex.loadIvfPqCodes(s, path)
      .select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert((451L to 460L).forall(codeIds.contains),
      "the post-compaction drop must be present in the coded lists")
    assert(!codeIds.exists(id => (id >= 440 && id < 450) || id % 50 == 0))
    // and the second drop is SEARCHABLE, not just stored: probe with
    // 455's own VECTOR under a fresh query id (search excludes the
    // query's id from results, so a literal self-query can never return
    // itself) and k covering the probed lists — the vector's nearest
    // centroid is its append-time list, which is always among its
    // nProbe probes, so 455 must surface. (No top-1 assertion: ADC
    // distance is quantized, and a neighbor's reconstruction can land
    // closer to the query than 455's own quantization error.)
    val wide = VectorIndex.searchIvfPq(s, path,
      emb.filter(col("vec_id") === 455)
        .withColumn("vec_id", lit(999999L)),
      "vec_id", "embedding",
      k = 1000, nProbe = 2).collect().map(_.getLong(1)).toSet
    assert(wide.contains(455L))
    assert(!wide.exists(id => (id >= 440 && id < 450) || id % 50 == 0))
  }

  test("compact with no tombstones is a no-op; loadTombstones on a fresh index is empty") {
    val path = Files.createTempDirectory("vidx_del_noop").toString
    VectorIndex.buildBinary(emb, "vec_id", "embedding", path)
    assert(VectorIndex.loadTombstones(s, path).count() == 0)
    val before = VectorIndex.loadBinaryCodes(s, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    VectorIndex.compact(s, path)
    assert(VectorIndex.loadBinaryCodes(s, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == before)
  }
}
