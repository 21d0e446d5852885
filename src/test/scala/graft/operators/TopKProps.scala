package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check: the bounded-buffer aggregator equals the ROW_NUMBER
  * window formulation on random data with duplicate values, ties and NaN
  * (NaN ordering was a real divergence caught in review: Spark `DESC`
  * ranks NaN first, Scala's Ordering.by(-v) ranked it last).
  */
object TopKProps extends Properties("graft.topk") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val genRows = Gen.listOfN(60, Gen.zip(
    Gen.choose(1, 3),
    Gen.frequency(
      8 -> Gen.choose(0, 5).map(_.toDouble), // heavy ties
      1 -> Gen.const(Double.NaN),
      1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity))))

  property("equals ROW_NUMBER window incl. ties, NaN, infinities") =
    Prop.forAll(genRows) { rows0 =>
      import spark.implicits._
      val df = rows0.zipWithIndex
        .map { case ((k, v), i) => (s"k$k", v, i.toLong) }
        .toDF("k", "v", "id")

      val got = TopK.perGroup(df, Seq("k"), "v", "id", k = 4)
        .select("k", "rank", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
      val want = df.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 4)
        .select("k", "rank", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

      got == want
    }
}
