package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupKnnSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("LSH candidates recover every exact-Jaccard>=0.8 near-dup pair") {
    val docs = Tables.documents(spark, sf)
    val exact = MinHashLSH.jaccardPairs(docs, "doc_id", "text", 800000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        k = 64, bands = 16, minEstPpm = 500000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(exact.subsetOf(lsh),
      s"LSH missed ${exact.diff(lsh)}")
  }

  test("fast (xxhash64) LSH also recovers the planted near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val exact = MinHashLSH.jaccardPairs(docs, "doc_id", "text", 800000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        k = 64, bands = 16, minEstPpm = 500000L,
        shingleFn = c => graft.functions.Text.shingleHashesWith(
          c, 3, graft.functions.Text.fastHash))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(fast), s"fast LSH missed ${exact.diff(fast)}")
  }

  test("sign-bucket LSH: deterministic buckets, NN bounded by brute top-1") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("bucket", Knn.signBucket(col("embedding"), 64, 6))
      .cache()
    val b1 = emb.select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = Tables.embeddings(spark, sf)
      .withColumn("bucket", Knn.signBucket(col("embedding"), 64, 6))
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 == b2, "bucketing must be deterministic")
    assert(b1.values.forall(b => b >= 0 && b < 64), "6 planes → bucket in [0, 64)")

    val lshNN = Knn.nnWithinBucket(emb, "vec_id", "embedding", "bucket")
      .select("vec_id", "nn_sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val bruteTop1 = Knn.bruteTopK(
        Tables.embeddings(spark, sf), Tables.embeddings(spark, sf),
        "vec_id", "embedding", k = 1)
      .select("query_id", "sim_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lshNN.nonEmpty)
    // within-bucket NN can never beat the global brute-force top-1
    lshNN.foreach { case (id, sim) => assert(sim <= bruteTop1(id)) }
  }

  test("brute top-k: k rows per query, descending sim, self excluded") {
    val emb = Tables.embeddings(spark, sf)
    val out = Knn.bruteTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 4).cache()
    assert(out.count() == 12)
    assert(out.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val perQuery = out.orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
    perQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("sim_ppm"))
      assert(sims.sameElements(sims.sorted.reverse), "ranks follow sim desc")
    }
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val sim = df.select(Knn.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }
}
