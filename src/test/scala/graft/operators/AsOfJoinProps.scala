package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check: both as-of directions equal a brute-force per-row model
  * on random inputs (right side unique per (key, time) per the contract).
  */
object AsOfJoinProps extends Properties("graft.asof") {

  // Spark jobs per case are expensive — 15 random cases is plenty.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session

  private val genLeft = Gen.listOfN(30,
    Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 40L)))
  private val genRight = Gen.listOfN(20,
    Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 40L), Gen.choose(0.0, 100.0)))

  property("both directions equal the brute-force model") =
    Prop.forAll(genLeft, genRight) { (l0, r0) =>
      import spark.implicits._
      val left = l0.zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
      val right = r0.groupBy(t => (t._1, t._2)).values.map(_.head)
        .map { case (k, t, v) => (s"k$k", t, v) }.toList

      val lDf = left.toDF("id", "key", "t")
      val rDf = right.toDF("key", "t", "rv")

      def run(fwd: Boolean): Map[Long, Option[Long]] = {
        val out =
          if (fwd) AsOfJoin.forward(lDf, rDf, "key", "t", "t", Seq("t", "rv"))
          else AsOfJoin.backward(lDf, rDf, "key", "t", "t", Seq("t", "rv"))
        out.select("id", "asof_t")
          .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
          .toMap
      }

      def model(fwd: Boolean): Map[Long, Option[Long]] = left.map { case (id, k, t) =>
        val cands = right.filter(r => r._1 == k && (if (fwd) r._2 >= t else r._2 <= t))
        id -> (if (cands.isEmpty) None
               else Some(if (fwd) cands.map(_._2).min else cands.map(_._2).max))
      }.toMap

      run(fwd = false) == model(fwd = false) && run(fwd = true) == model(fwd = true)
    }
}
