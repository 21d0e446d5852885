package graft.operators

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders_t", "o_custkey", 4)
    Bucketing.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer_t", "o_custkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders_t", "b_customer_t", "o_custkey")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders_t")
      spark.sql("DROP TABLE IF EXISTS b_customer_t")
    }
  }
}
