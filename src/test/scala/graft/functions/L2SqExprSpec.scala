package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.PQ
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class L2SqExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("native l2sq is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(200).cache()
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        PQ.l2sq(col("a.embedding"), col("b.embedding")).as("native"),
        PQ.l2sqHof(col("a.embedding"), col("b.embedding")).as("hof"))
    val diff = pairs.filter(col("native") =!= col("hof")).count()
    assert(diff === 0, s"$diff pairs differ between native and HOF l2sq")
    e.unpersist()
  }

  test("self-distance is 0.0 and double arrays are accepted") {
    val df = spark.createDataFrame(Seq(
      (1L, Array(1.0, 2.0, 3.0)), (2L, Array(-4.0, 0.0, 0.5))))
      .toDF("id", "v")
    val ds = df.select(L2SqExpr(col("v"), col("v")).as("d"))
      .collect().map(_.getDouble(0))
    assert(ds.forall(_ == 0.0))
  }

  test("mixed float/double argument order matches the HOF value") {
    val df = spark.createDataFrame(Seq(
      (Array(1.0f, 2.5f, -3.0f), Array(0.5, -1.5, 2.0))))
      .toDF("f", "d")
    val r = df.select(
      PQ.l2sq(col("f"), col("d")).as("n"),
      PQ.l2sqHof(col("f"), col("d")).as("h")).head()
    assert(r.getDouble(0) === r.getDouble(1))
  }
}
