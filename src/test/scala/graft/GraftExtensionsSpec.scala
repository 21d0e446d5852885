package graft

import graft.functions.PolyHashExpr
import graft.operators.SaltedAgg
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class GraftExtensionsSpec extends AnyFunSuite {

  test("poly_hash is callable from SQL after registration") {
    // NOTE: never stop this shared session, and don't use the builder's
    // withExtensions here — with an active session in the JVM, getOrCreate
    // returns it and silently ignores extensions.
    val spark = SparkSpec.session
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT poly_hash('abc') AS h").head().getLong(0)
    // fold: ((0*31+97)*31+98)*31+99 mod P
    val exp = ((97L * 31 + 98) * 31 + 99) % PolyHashExpr.P
    assert(got == exp)
    assert(spark.sql("SELECT poly_hash(NULL) AS h").head().isNullAt(0))
  }
}

class SaltedAggSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("salted two-stage aggregate equals the plain groupBy on skewed data") {
    val rng = new Random(11)
    // 90% of rows on one hot key
    val df = (1 to 5000).map { i =>
      val k = if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(50)}"
      (k, i.toLong, rng.nextDouble() * 100)
    }.toDF("key", "uid", "v")

    val salted = SaltedAgg.countSumMinMax(df, "key", $"uid", $"v", salt = 16)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val plain = df.groupBy($"key")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,6)")).cast("double").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(salted.sameElements(plain))
  }
}
