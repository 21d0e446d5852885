package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The Hamming-join rewrite must (a) fire on the naive popcount-of-XOR
  * bound and plan an equi-join instead of a nested-loop join, and
  * (b) never change results — including row MULTIPLICITY (no Distinct
  * is inserted; the first-band guard dedups band collisions), both
  * predicate forms, residual conjuncts, and the fire/skip guards. */
class HammingJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.session
    if (!s.experimental.extraOptimizations.contains(HammingJoinRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ HammingJoinRule
    s
  }

  /** Deterministic 64-bit-ish hashes with planted near-dups: pairs of
    * ids (i, i+1000) differ in exactly (i mod 5) low bits; everything
    * else is far apart. Ids 7 and 8 share ONE hash value (multiplicity
    * trap: both must pair with their clones independently). */
  private def hashes: DataFrame = {
    import spark.implicits._
    val base = (0L until 60L).map { i =>
      val h = i * 0x9E3779B97F4A7C15L
      (i, h)
    }
    val nears = (0L until 60L by 7L).map { i =>
      val h = i * 0x9E3779B97F4A7C15L
      (i + 1000L, h ^ ((1L << (i % 5).toInt) - 1L)) // (i%5) low bits flipped
    }
    (base ++ nears ++ Seq((8L, 7L * 0x9E3779B97F4A7C15L)))
      .toDF("id", "h")
  }

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.hammingRewrite.enabled", on.toString)
    try f finally
      spark.conf.set("spark.graft.hammingRewrite.enabled", "true")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.toString)

  test("single-long form: fires, plans an equi-join, exact same rows as rule-off") {
    hashes.createOrReplaceTempView("hjr_t")
    val sql =
      """SELECT a.id AS id_a, b.id AS id_b,
        |       bit_count(a.h ^ b.h) AS hamming
        |FROM hjr_t a JOIN hjr_t b
        |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 4""".stripMargin
    val on = spark.sql(sql)
    val plan = on.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rewrite did not remove the nested-loop join:\n$plan")
    val expect = withRule(on = false)(rows(spark.sql(sql)))
    assert(expect.nonEmpty, "fixture must produce pairs")
    assert(rows(on) == expect)
  }

  test("two-half form over 32-bit halves: parity with rule-off") {
    import spark.implicits._
    val df = hashes.selectExpr("id",
      "shiftright(h, 32) & 4294967295L AS hi", "h & 4294967295L AS lo")
    df.createOrReplaceTempView("hjr_halves")
    val sql =
      """SELECT a.id AS id_a, b.id AS id_b
        |FROM hjr_halves a JOIN hjr_halves b
        |  ON a.id < b.id
        | AND bit_count(a.hi ^ b.hi) + bit_count(a.lo ^ b.lo) <= 4""".stripMargin
    val on = spark.sql(sql)
    assert(!on.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(rows(on) == withRule(on = false)(rows(spark.sql(sql))))
  }

  test("multiplicity: duplicate hash values pair once per ROW, as nested-loop would") {
    // ids 7 and 8 carry the same hash → the clone of 7 (id 1007) must
    // pair with BOTH; a distinct-inserting rewrite would collapse rows
    // in aggregations over the join
    hashes.createOrReplaceTempView("hjr_m")
    val sql =
      """SELECT count(*) AS n FROM hjr_m a JOIN hjr_m b
        |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 4""".stripMargin
    val n = spark.sql(sql).head().getLong(0)
    val nOff = withRule(on = false)(spark.sql(sql).head().getLong(0))
    assert(n == nOff, s"rewrite changed multiplicity: $n vs $nOff")
  }

  test("strict '<' bound and reversed literal-first orientation both fire") {
    hashes.createOrReplaceTempView("hjr_lt")
    for (pred <- Seq("bit_count(a.h ^ b.h) < 5", "5 > bit_count(a.h ^ b.h)",
        "4 >= bit_count(a.h ^ b.h)", "bit_count(a.h ^ b.h) = 0")) {
      val sql = s"""SELECT a.id, b.id FROM hjr_lt a JOIN hjr_lt b
        ON a.id < b.id AND $pred"""
      val on = spark.sql(sql)
      assert(!on.queryExecution.executedPlan.toString.contains("NestedLoop"),
        s"did not fire for: $pred")
      assert(rows(on) == withRule(on = false)(rows(spark.sql(sql))))
    }
  }

  test("fires on a join between two DIFFERENT tables (probe vs reference shape)") {
    hashes.filter("id < 40").createOrReplaceTempView("hjr_ref")
    hashes.filter("id >= 1000").createOrReplaceTempView("hjr_probe")
    val sql =
      """SELECT p.id AS id_p, r.id AS id_r
        |FROM hjr_probe p JOIN hjr_ref r
        |  ON bit_count(p.h ^ r.h) <= 4""".stripMargin
    val on = spark.sql(sql)
    assert(!on.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val got = rows(on)
    assert(got == withRule(on = false)(rows(spark.sql(sql))))
    assert(got.nonEmpty, "planted near-dups must match across the tables")
  }

  test("does not fire when an equi conjunct exists (hash join already planned)") {
    import spark.implicits._
    val df = hashes.withColumn("grp",
      org.apache.spark.sql.functions.expr("id % 3"))
    df.createOrReplaceTempView("hjr_eq")
    val on = spark.sql(
      """SELECT a.id, b.id FROM hjr_eq a JOIN hjr_eq b
        |  ON a.grp = b.grp AND a.id < b.id
        | AND bit_count(a.h ^ b.h) <= 4""".stripMargin)
    val plan = on.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bk"),
      s"rule must leave equi-joins alone:\n$plan")
  }

  test("literal-first one-sided equality is NOT an equi key — rewrite still fires") {
    // `0 = b.id % 2` references only ONE side; the empty-reference-set
    // subset trap would classify it as an equi conjunct and leave the
    // nested-loop plan (the column-first spelling already worked)
    hashes.createOrReplaceTempView("hjr_lit")
    for (pred <- Seq("0 = b.id % 2", "b.id % 2 = 0")) {
      val sql = s"""SELECT a.id AS id_a, b.id AS id_b
        FROM hjr_lit a JOIN hjr_lit b
        ON a.id < b.id AND bit_count(a.h ^ b.h) <= 4 AND $pred"""
      val on = spark.sql(sql)
      assert(!on.queryExecution.executedPlan.toString.contains("NestedLoop"),
        s"one-sided equality '$pred' must not suppress the rewrite")
      assert(rows(on) == withRule(on = false)(rows(spark.sql(sql))))
    }
  }

  test("huge radius skips the rewrite (probe cap) but results still correct") {
    hashes.createOrReplaceTempView("hjr_big")
    val sql =
      """SELECT count(*) AS n FROM hjr_big a JOIN hjr_big b
        |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 60""".stripMargin
    // s = 60/8 = 7 → C(8,≤7) = 255 flips ≤ default cap 512: still fires;
    // crank the cap down to force the skip path
    spark.conf.set("spark.graft.hammingRewrite.maxProbes", "8")
    try {
      val n = spark.sql(sql).head().getLong(0)
      val nOff = withRule(on = false)(spark.sql(sql).head().getLong(0))
      assert(n == nOff)
    } finally spark.conf.unset("spark.graft.hammingRewrite.maxProbes")
  }

  test("band width derives from plan statistics: small plans 4-bit, huge plans 8-bit") {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode}
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    // plan-only (never executed): the probe-side Generate's array arity
    // identifies the chosen width — bands×flips at tau=12 over one LONG
    // column is 8×5=40 entries for 4-bit bands, 4×93=372 for 8-bit
    // (16-bit needs 14,893 probes > maxProbes=512: filtered as
    // infeasible BEFORE costing, so scale can never silently skip the
    // rewrite). The cost model's 4→8 boundary at this shape is ~40k rows.
    def probeArity(n: Long): Seq[Int] = {
      spark.range(n).selectExpr("id", "id * 123L AS h")
        .createOrReplaceTempView("hjr_stats")
      val df = spark.sql(
        """SELECT a.id FROM hjr_stats a JOIN hjr_stats b
          |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 12""".stripMargin)
      df.queryExecution.optimizedPlan.collect {
        case g: Generate => g.generator match {
          case Explode(arr: CreateArray) => arr.children.length
          case _ => 0
        }
      }
    }
    assert(probeArity(1000L).max == 40,
      "a 1k-row plan must derive cheap 4-bit exact bands")
    assert(probeArity(10000000L).max == 372,
      "a 10M-row plan must derive 8-bit bands (n²/2^b dominates)")
    // the conf override still wins over the derivation
    spark.conf.set("spark.graft.hammingRewrite.bandBits", "8")
    try assert(probeArity(1000L).max == 372,
      "explicit bandBits must override the statistics derivation")
    finally spark.conf.unset("spark.graft.hammingRewrite.bandBits")
  }

  test("e2e: an ANALYZE'd catalog table under CBO derives the corpus-true " +
    "width where the file-size fallback overestimates") {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode}
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    def arity(df: DataFrame): Int = df.queryExecution.optimizedPlan.collect {
      case g: Generate => g.generator match {
        case Explode(arr: CreateArray) => arr.children.length
        case _ => 0
      }
    }.max
    // 1k rows padded with ~4 KB of incompressible text each: the table's
    // FILE size says "hundreds of thousands of rows", its true count says
    // one thousand — exactly the gap ANALYZE closes for a real session
    spark.sql("DROP TABLE IF EXISTS hjr_cat")
    spark.range(1000L)
      .selectExpr("id", "id * 123L AS h",
        "concat_ws('', transform(sequence(1, 128), " +
          "i -> md5(cast(id * 1000 + i AS STRING)))) AS pad")
      .write.mode("overwrite").saveAsTable("hjr_cat")
    val sql =
      """SELECT a.id FROM hjr_cat a JOIN hjr_cat b
        |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 12""".stripMargin
    try {
      // no stats: only file bytes to go on — the fat pad column makes the
      // sizeInBytes fallback OVERESTIMATE and derive the wide 8-bit band
      // (the safe direction: wider bands cost probes, never correctness)
      assert(arity(spark.sql(sql)) == 372,
        "the un-analyzed fallback must overestimate from file size here")
      // the standard production step: ANALYZE + CBO → exact rowCount →
      // the cheap 4-bit exact band a 1k-row corpus actually wants
      spark.sql("ANALYZE TABLE hjr_cat COMPUTE STATISTICS")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      assert(arity(spark.sql(sql)) == 40,
        "ANALYZE'd rowCount under CBO must derive the corpus-true width")
      // and the rewrite still yields correct rows on the analyzed table
      val n = spark.sql(sql).count()
      val nOff = withRule(on = false)(spark.sql(sql).count())
      assert(n == nOff)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS hjr_cat")
    }
  }

  test("tau = 0 degenerates to the exact-key band join and keeps parity") {
    hashes.createOrReplaceTempView("hjr_z")
    val sql =
      """SELECT a.id AS id_a, b.id AS id_b FROM hjr_z a JOIN hjr_z b
        |  ON a.id < b.id AND bit_count(a.h ^ b.h) <= 0""".stripMargin
    val on = spark.sql(sql)
    assert(!on.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val got = rows(on)
    assert(got == withRule(on = false)(rows(spark.sql(sql))))
    assert(got.nonEmpty, "the shared-hash ids 7/8 must collide at tau=0")
  }
}
