package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class LatestPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def fixture = {
    val rng = new Random(7)
    // duplicate timestamps within keys to exercise tie-breaking
    (1 to 500).map { i =>
      (s"k${rng.nextInt(20)}", rng.nextInt(50).toLong, i.toLong, rng.nextDouble())
    }.toDF("key", "ts", "uid", "v")
  }

  test("maxBy and window formulations agree with a unique tiebreaker") {
    val df = fixture
    val ord = Seq(col("ts"), col("uid"))
    val a = LatestPerKey.maxBy(df, "key", ord)
      .orderBy("key").collect().toSeq
    val b = LatestPerKey.window(df, "key", ord)
      .select(a.head.schema.fieldNames.map(col): _*)
      .orderBy("key").collect().toSeq
    assert(a == b)
  }

  test("one row per key, carrying that key's max (ts, uid)") {
    val df = fixture
    val out = LatestPerKey.maxBy(df, "key", Seq(col("ts"), col("uid"))).cache()
    assert(out.count() == df.select("key").distinct().count())
    val expected = df.groupBy("key")
      .agg(max(struct(col("ts"), col("uid"))).as("m"))
      .select($"key", $"m.ts".as("ts"), $"m.uid".as("uid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = out.select("key", "ts", "uid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("result rows are a subset of the input") {
    val df = fixture
    val out = LatestPerKey.maxBy(df, "key", Seq(col("ts"), col("uid")))
    assert(out.exceptAll(df.select(out.columns.map(col): _*)).isEmpty)
  }
}
