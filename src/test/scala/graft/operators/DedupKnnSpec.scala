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
