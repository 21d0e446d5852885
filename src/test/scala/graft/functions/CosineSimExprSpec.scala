package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("native cosine is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(200).cache()
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        Knn.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Knn.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    val diff = pairs.filter(col("native") =!= col("hof")).count()
    assert(diff === 0, s"$diff pairs differ between native and HOF cosine")
    e.unpersist()
  }

  test("self-similarity is 1.0 and double arrays are accepted") {
    val df = spark.createDataFrame(Seq(
      (1L, Array(1.0, 2.0, 3.0)), (2L, Array(-4.0, 0.0, 0.5))))
      .toDF("id", "v")
    val sims = df.select(CosineSimExpr(col("v"), col("v")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-15))
  }
}
