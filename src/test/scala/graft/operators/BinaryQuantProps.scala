package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property checks for binary quantization: the packed code is exactly the
  * per-dimension strict-greater comparisons (decoded bit-by-bit on the
  * JVM), and the Hamming search agrees with a from-scratch popcount model.
  */
object BinaryQuantProps extends Properties("graft.binaryquant") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val dim = 16
  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-4, 4).map(x => x.toFloat / 2))
  private val genCorpus: Gen[List[Seq[Float]]] = Gen.listOfN(12, genVec)
  private val genThr: Gen[Seq[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-2, 2).map(x => x.toFloat / 2))

  property("code bits decode to the per-dim strict-greater comparisons") =
    Prop.forAll(genCorpus, genThr) { (vecs, thr) =>
      import spark.implicits._
      val thrDf = Seq(Tuple1(thr)).toDF("__thr")
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = BinaryQuant.withCode(emb, "embedding", thrDf)
        .select(col("vec_id"), col("code"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        val expected = v.zip(thr).zipWithIndex.foldLeft(0L) {
          case (acc, ((x, t), bit)) => if (x > t) acc | (1L << bit) else acc
        }
        got(i.toLong) == expected
      }
    }

  property("hammingRerankTopK coarse candidates match a popcount model") =
    Prop.forAll(genCorpus, genThr) { (vecs, thr) =>
      import spark.implicits._
      val thrDf = Seq(Tuple1(thr)).toDF("__thr")
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val coded = BinaryQuant.withCode(emb, "embedding", thrDf)
      val k = 3
      val got = BinaryQuant.hammingRerankTopK(coded, "vec_id", "embedding",
          coded.filter(col("vec_id") === 0L), k, rerankWidth = 6)
        .select(col("neighbor_id"), col("hamming"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      // model: popcount coarse top-6 by (hamming, id) — the engine's top-k
      // must be a subset of it, with matching distances
      def code(v: Seq[Float]) = v.zip(thr).zipWithIndex.foldLeft(0L) {
        case (acc, ((x, t), bit)) => if (x > t) acc | (1L << bit) else acc
      }
      val q = code(vecs.head)
      val model = vecs.zipWithIndex.drop(1)
        .map { case (v, i) =>
          (i.toLong, java.lang.Long.bitCount(code(v) ^ q)) }
        .sortBy { case (id, h) => (h, id) }
        .take(6).toMap
      got.size == math.min(k, model.size) &&
        got.forall { case (id, h) => model.get(id).contains(h) }
    }
}
