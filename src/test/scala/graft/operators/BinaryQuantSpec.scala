package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinaryQuantSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def embDf(rows: Seq[(Long, Seq[Float])]) = {
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("fitThresholds picks the per-dim lower median (order statistic)") {
    // dim 0 values: 1,2,3,4,5 -> lower median 3; dim 1: 10,20,30,40,50 -> 30
    val emb = embDf((1L to 5L).map(i => (i, Seq(i.toFloat, i.toFloat * 10))))
    val thr = BinaryQuant.fitThresholds(emb, "embedding")
      .collect()(0).getSeq[Float](0)
    assert(thr == Seq(3.0f, 30.0f))
  }

  test("fitThresholds even count picks the ceil(n/2)-th smallest") {
    val emb = embDf((1L to 4L).map(i => (i, Seq(i.toFloat))))
    val thr = BinaryQuant.fitThresholds(emb, "embedding")
      .collect()(0).getSeq[Float](0)
    assert(thr == Seq(2.0f)) // (4+1) div 2 = 2nd smallest
  }

  test("withCode packs sign bits little-endian incl. bit 63 = Long.MinValue") {
    import s.implicits._
    // 64 dims; thresholds all 0; vector has positives at dims 0, 2, 63
    val vec = (0 until 64).map(i => if (i == 0 || i == 2 || i == 63) 1f else -1f)
    val thr = Seq(Tuple1((0 until 64).map(_ => 0f))).toDF("__thr")
    val code = BinaryQuant.withCode(embDf(Seq((7L, vec))), "embedding", thr)
      .select(col("code")).collect()(0).getLong(0)
    assert(code == (1L | (1L << 2) | Long.MinValue))
  }

  test("strictly-greater comparison: value equal to threshold sets no bit") {
    import s.implicits._
    val thr = Seq(Tuple1(Seq(5f, 5f))).toDF("__thr")
    val code = BinaryQuant
      .withCode(embDf(Seq((1L, Seq(5f, 6f)))), "embedding", thr)
      .select(col("code")).collect()(0).getLong(0)
    assert(code == 2L) // only dim 1 (6 > 5); dim 0 (5 > 5) is false
  }

  test("hammingRerankTopK: coarse Hamming candidates, exact-cosine final order") {
    // Orthogonal-ish handcrafted 4-dim corpus extended to 64 dims with 0s
    def v(xs: Float*): Seq[Float] = xs ++ Seq.fill(64 - xs.size)(0f)
    val emb = embDf(Seq(
      0L -> v(1f, 1f, -1f, -1f),
      1L -> v(1f, 1f, -1f, -0.5f),   // closest to 0 by cosine AND Hamming
      2L -> v(1f, -1f, 1f, -1f),
      3L -> v(-1f, -1f, 1f, 1f),     // antipode of 0
      4L -> v(1f, 1f, -1f, -0.9f)))  // near-dup of 0
    val thr = BinaryQuant.fitThresholds(emb, "embedding")
    val coded = BinaryQuant.withCode(emb, "embedding", thr)
    val out = BinaryQuant.hammingRerankTopK(
        coded, "vec_id", "embedding",
        coded.filter(col("vec_id") === 0L), k = 2, rerankWidth = 4)
      .collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 4L))
    // ranks are 1..k and sims are sane
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2))
    assert(out.forall(_.getAs[Long]("sim_ppm") > 0L))
  }

  test("sketch fit yields balanced codes like the exact fit") {
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def meanBits(thr: org.apache.spark.sql.DataFrame): Double =
      BinaryQuant.withCode(emb, "embedding", thr)
        .agg(avg(expr("bit_count(code)"))).collect()(0).getDouble(0)
    val exact = meanBits(BinaryQuant.fitThresholds(emb, "embedding"))
    val approx = meanBits(BinaryQuant.fitThresholdsApprox(emb, "embedding"))
    // a median threshold splits every dim ~50/50 → ~32 of 64 bits set
    assert(exact > 24 && exact < 40, s"exact fit unbalanced: $exact")
    assert(math.abs(approx - exact) < 4,
      s"sketch fit drifted from exact: $approx vs $exact")
  }

  test("one-pass partitioned search equals the declarative pair-join form") {
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(7) // uneven partitions: the per-partition heaps must merge
    val thr = BinaryQuant.fitThresholds(emb, "embedding")
    val coded = BinaryQuant.withCode(emb, "embedding", thr)
    val queries = coded.filter(col("vec_id") < 25)
    val declarative = BinaryQuant.hammingRerankTopK(
      coded, "vec_id", "embedding", queries, k = 4, rerankWidth = 16)
    val onePass = BinaryQuant.hammingRerankTopKPartitioned(
      coded, "vec_id", "embedding", queries, k = 4, rerankWidth = 16)
    assert(onePass.collect().toSet == declarative.collect().toSet)
  }

  test("Hamming coarse recall vs brute cosine on the sf0.001 embeddings") {
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val thr = BinaryQuant.fitThresholds(emb, "embedding")
    val coded = BinaryQuant.withCode(emb, "embedding", thr)
    val queries = coded.filter(col("vec_id") < 20)
    val approx = BinaryQuant
      .hammingRerankTopK(coded, "vec_id", "embedding", queries,
        k = 5, rerankWidth = 64)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Knn.bruteTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hit = approx.intersect(exact).count()
    val total = exact.count()
    // binary codes + wide rerank should recover most true neighbors
    assert(total == 100 && hit >= 60, s"recall $hit/$total")
  }
}
