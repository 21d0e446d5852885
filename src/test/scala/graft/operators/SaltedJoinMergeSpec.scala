package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SaltedJoin must be result-identical to the plain join while actually
  * splitting a hot key across salts; Merge.upsert must implement full
  * MERGE semantics (update wins, pass-through, insert of new keys).
  */
class SaltedJoinMergeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  // 1 hot key owning 90% of rows + a tail of cold keys
  private def skewed = (
    (1 to 900).map(i => (42L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 20, 1000L + i))
    ).toDF("k", "row_id")

  private def dim = Seq((42L, "hot"), (3L, "cold3"), (7L, "cold7"))
    .toDF("k", "tag")

  test("salted join result equals the plain join result") {
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("row_id").as("s"))
    val salted = SaltedJoin.join(skewed, dim, Seq("k"),
        probeSalt = col("row_id") * 2654435761L, salts = 8)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("row_id").as("s"))
    assert(salted.orderBy("k").collect().toSeq ===
      plain.orderBy("k").collect().toSeq)
  }

  test("the hot key's probe rows actually spread across salts") {
    val salts = skewed.filter(col("k") === 42L)
      .select(pmod(col("row_id") * 2654435761L, lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(salts == 8, s"expected the hot key to use all 8 salts, got $salts")
  }

  test("salted join is a real shuffle join on (key, salt) when broadcast is off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = SaltedJoin.join(skewed, dim, Seq("k"),
        probeSalt = col("row_id") * 2654435761L, salts = 8)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt key missing from join plan:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("upsert: update wins, unmatched base passes through, new key inserts") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 90.0))
      .toDF("id", "name", "v")
    val merged = Merge.upsert(base, updates, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(merged === Seq(
      (1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("upsert with an empty change set is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val merged = Merge.upsert(base, base.limit(0), Seq("id"))
    assert(merged.orderBy("id").collect().toSeq ===
      base.orderBy("id").collect().toSeq)
  }
}
