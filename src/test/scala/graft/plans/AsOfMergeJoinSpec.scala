package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfMergeJoinSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  test("hand case: latest right at/before each left time, left-outer") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 100L), (1L, 15L, 200L), (2L, 6L, 300L))
      .toDF("k", "t", "v")
      .select(col("k").as("rk"), col("t").as("rt"), col("v"))
    val got = PhysicalAsOf.backward(left, right, "k", "t", "rk", "rt")
    // note: key columns differ by name (k vs rk) so no ambiguity
    val m = got.collect().map(r => (r.getString(2),
      Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(m == Map("a" -> Some(100L), "b" -> Some(200L),
      "c" -> None, "d" -> None))
  }

  test("physical plan: AsOfMergeJoinExec fed by exchanges and sorts") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 9L, 1L)).toDF("rk", "rt", "v")
    val df = PhysicalAsOf.backward(left, right, "k", "t", "rk", "rt")
      .filter(col("v").isNotNull)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), plan)
  }

  test("wrong key name fails loudly") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 9L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      PhysicalAsOf.backward(left, right, "nope", "t", "rk", "rt")
    }
  }

  test("mismatched key/time types fail at entry, not in executor tasks") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq(("1", 9L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      PhysicalAsOf.backward(left, right, "k", "t", "rk", "rt")
    }
  }

  test("randomized differential vs the union+carry composition form") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 4) {
      val nKeys = 5
      val left = (1 to 300).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong, i.toLong)
      }
      // right unique per (key, time): required by both forms
      val right = (1 to 200).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong, i.toLong * 10)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rv")
        .select(col("k").as("rk"), col("t").as("rt"), col("rv"))

      val phys = PhysicalAsOf.backward(lDf, rDf, "k", "t", "rk", "rt")
        .select(col("lid"), col("rv"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

      val comp = AsOfJoin.backward(
          lDf, right.toDF("k", "t", "rv"), "k", "t", "t", Seq("rv"))
        .select(col("lid"), col("asof_rv"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

      assert(phys == comp, s"trial $trial")
    }
  }

  test("forward hand case: earliest right at/after each left time, peeked not consumed") {
    val left = Seq((1L, 10L, "a"), (1L, 12L, "b"), (1L, 20L, "c"), (2L, 5L, "d"))
      .toDF("k", "t", "tag")
    // one right row serves BOTH a and b (peek semantics)
    val right = Seq((1L, 14L, 100L), (1L, 25L, 200L), (2L, 4L, 300L))
      .toDF("rk", "rt", "v")
    val m = PhysicalAsOf.forward(left, right, "k", "t", "rk", "rt")
      .collect().map(r => (r.getString(2),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(m == Map("a" -> Some(100L), "b" -> Some(100L),
      "c" -> Some(200L), "d" -> None))
  }

  test("forward randomized differential vs the union+carry composition form") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val nKeys = 5
      val left = (1 to 300).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong, i.toLong)
      }
      val right = (1 to 200).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong, i.toLong * 10)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rv")
        .select(col("k").as("rk"), col("t").as("rt"), col("rv"))

      val phys = PhysicalAsOf.forward(lDf, rDf, "k", "t", "rk", "rt")
        .select(col("lid"), col("rv"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

      val comp = graft.operators.AsOfJoin.forward(
          lDf, right.toDF("k", "t", "rv"), "k", "t", "t", Seq("rv"))
        .select(col("lid"), col("asof_rv"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

      assert(phys == comp, s"trial $trial")
    }
  }

  test("null keys and times match nothing; null right rows are skipped") {
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(9L), 1L), (Some(1L), None, 2L),
      (None, Some(5L), 3L)).toDF("rk", "rt", "v")
    val m = PhysicalAsOf.backward(left, right, "k", "t", "rk", "rt")
      .collect().map(r => (r.getString(2),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(m == Map("a" -> Some(1L), "b" -> None, "c" -> None))
  }
}
