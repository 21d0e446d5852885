package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rule must (a) fire on the textbook row_number=1 idiom and plan an
  * aggregate instead of a window sort, and (b) never change results —
  * including ties, nulls in payload, residual predicates, and the
  * direction/null-ordering gates.
  */
class LatestPerKeyRuleSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkSpec.session
    if (!s.experimental.extraOptimizations.contains(LatestPerKeyRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ LatestPerKeyRule
    s
  }

  private def data: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 10L, Some("a")), (1L, 20L, Some("b")), (1L, 15L, None),
      (2L, 5L, Some("x")),
      (3L, 7L, Some("p")), (3L, 7L, Some("q"))) // tie on the order key
      .toDF("k", "o", "v")
  }

  private def windowForm(desc: Boolean): DataFrame = {
    // tiebreak shares the direction — mixed directions gate the rule off
    val w = Window.partitionBy(col("k"))
      .orderBy(
        if (desc) col("o").desc else col("o").asc,
        if (desc) col("v").desc else col("v").asc)
    data.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
  }

  test("fires: optimized plan has no Window, aggregates with max_by") {
    val df = windowForm(desc = true)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Window"), s"rule did not remove the window:\n$opt")
    assert(opt.contains("max_by"), s"expected max_by aggregate:\n$opt")
  }

  test("descending: same rows as the unoptimized window form") {
    // reference computed WITHOUT the rule (plain aggregate semantics)
    val got = windowForm(desc = true)
      .select("k", "o", "v", "rn").collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq(1L, 20L, "b", 1), Seq(2L, 5L, "x", 1), Seq(3L, 7L, "q", 1)))
  }

  test("ascending flips to min_by and keeps results") {
    val df = windowForm(desc = false)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("min_by"), s"expected min_by for ascending:\n$opt")
    val got = df.select("k", "o", "v").collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 10L, "a"), Seq(2L, 5L, "x"), Seq(3L, 7L, "p")))
  }

  test("residual conjuncts survive as a filter above the rewrite") {
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc, col("v").desc)
    val df = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("k") > 1)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Window") && opt.contains("max_by"), opt)
    val got = df.select("k", "o").collect().map(_.toSeq).toSet
    assert(got == Set(Seq(2L, 5L), Seq(3L, 7L)))
  }

  test("does not fire on rank > 1 or custom null ordering") {
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc)
    val second = data.withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
    assert(second.queryExecution.optimizedPlan.toString.contains("Window"))

    val wn = Window.partitionBy(col("k")).orderBy(col("o").desc_nulls_first)
    val custom = data.withColumn("rn", row_number().over(wn)).filter(col("rn") === 1)
    assert(custom.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("randomized: rewritten plan matches Scala-computed ground truth") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(20).toLong,
      rnd.nextInt(10).toLong, rnd.nextInt(5).toLong))
    val df = rows.toDF("k", "o", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc, col("v").desc)
    val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "o", "v").collect().map(_.toSeq).toSet
    // duplicates of the full (o, v) key make several rows equally "latest";
    // any of them is a valid pick, so compare on the (o, v) value
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      val (_, o, v) = rs.maxBy(r => (r._2, r._3))
      Seq(k, o, v)
    }.toSet
    assert(got == expect)
  }

  test("null order keys rank like the window default (desc nulls last)") {
    import spark.implicits._
    val df = Seq((1L, Some(3L), "a"), (1L, None, "b"), (2L, None, "c"))
      .toDF("k", "o", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc)
    val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "v").collect().map(_.toSeq).toSet
    // k=1: non-null 3 outranks null; k=2: the null row is all there is
    assert(got == Set(Seq(1L, "a"), Seq(2L, "c")))
  }
}
