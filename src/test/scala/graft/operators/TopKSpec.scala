package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("bounded-buffer top-k equals the window formulation, incl. ties") {
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 9.0, 4L),
      ("b", 1.0, 5L), ("b", 2.0, 6L),
      ("c", 7.0, 7L))
      .toDF("k", "v", "id")

    val got = TopK.perGroup(df, Seq("k"), "v", "id", k = 2)
      .select("k", "rank", "value", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet

    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2)
      .select("k", "rank", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet

    assert(got == want)
  }

  test("buffer trimming never drops a true top-k row (many rows per key)") {
    val df = (1 to 5000).map(i => ("k", (i * 37 % 1000).toDouble, i.toLong))
      .toDF("k", "v", "id").repartition(8)
    val got = TopK.perGroup(df, Seq("k"), "v", "id", k = 5)
      .select("rank", "value", "id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toList
      .sortBy(_._1)
    val want = (1 to 5000).map(i => ((i * 37 % 1000).toDouble, i.toLong))
      .sortBy(t => (-t._1, t._2)).take(5).zipWithIndex
      .map { case ((v, id), p) => (p + 1, v, id) }.toList
    assert(got == want)
  }
}
