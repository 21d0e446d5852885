package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential tests for the evaluation statistics: the distributed
  * distinct-score formulations in EvalQueries must equal the quadratic
  * textbook definitions (pairwise AUC wins, brute max-CDF-gap KS) on
  * randomized fixtures, including heavy tie mass.
  */
class EvalStatsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_eval_fixture").toString

  test("rank-sum AUC equals pairwise win/tie counting, ties included") {
    import spark.implicits._
    val rnd = new Random(11)
    // scores drawn from a small range to force many ties
    val docs = (0 until 400).map { i =>
      val pos = rnd.nextBoolean()
      val score = (if (pos) rnd.nextInt(30) + 5 else rnd.nextInt(30)).toLong
      (i.toLong, score, if (pos) "en" else "de")
    }
    val dir = fixtureDir()
    docs.toDF("doc_id", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = SparkEntry.queries("q_auc_rank")(spark, dir).collect().head
    val (p, n, aucPpm) = (r.getLong(0), r.getLong(1), r.getLong(2))

    val posScores = docs.filter(_._3 == "en").map(_._2)
    val negScores = docs.filter(_._3 != "en").map(_._2)
    val wins = (for (a <- posScores; b <- negScores) yield
      if (a > b) 2L else if (a == b) 1L else 0L).sum
    assert(p == posScores.size.toLong && n == negScores.size.toLong)
    assert(aucPpm ==
      wins * 1000000L / (2L * posScores.size * negScores.size))
  }

  test("average precision equals the per-threshold definition") {
    import spark.implicits._
    val rnd = new Random(29)
    val docs = (0 until 300).map { i =>
      val pos = rnd.nextInt(4) == 0 // imbalanced, AP's home turf
      val score = (if (pos) rnd.nextInt(25) + 8 else rnd.nextInt(25)).toLong
      (i.toLong, score, if (pos) "en" else "fr")
    }
    val dir = fixtureDir()
    docs.toDF("doc_id", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = SparkEntry.queries("q_avg_precision")(spark, dir).collect().head
    val (p, apPpm) = (r.getLong(0), r.getLong(1))

    val byScore = docs.groupBy(_._2).view.mapValues { ds =>
      (ds.count(_._3 == "en").toLong, ds.size.toLong)
    }.toMap
    val desc = byScore.keys.toSeq.sorted.reverse
    var (cp, ct, wsum) = (0L, 0L, 0L)
    for (s <- desc) {
      val (np, nt) = byScore(s)
      cp += np; ct += nt
      wsum += np * (cp * 1000000L / ct)
    }
    assert(p == cp)
    assert(apPpm == wsum / cp)
  }

  test("KS statistic equals the brute max CDF gap over both halves") {
    import spark.implicits._
    val rnd = new Random(13)
    val t0 = 1700000000L * 1000000000L // epoch nanos
    val events = (0 until 600).map { i =>
      val firstHalf = i < 300
      val ts = t0 + (if (firstHalf) i else 1000000 + i) * 1000000000L
      // shift the second half's distribution so D is well off zero
      val v = if (firstHalf) rnd.nextInt(50) / 10.0
              else (rnd.nextInt(50) + 12) / 10.0
      (ts, v)
    }
    val dir = fixtureDir()
    events.toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = SparkEntry.queries("q_ks_drift")(spark, dir).collect().head
    val (na, nb, ksPpm) = (r.getLong(0), r.getLong(1), r.getLong(2))

    // brute: split on the same midpoint rule, max over distinct scores of
    // |cumA·nB − cumB·nA|
    val eps = events.map(_._1 / 1000000000L)
    val (mn, mx) = (eps.min, eps.max)
    val scored = events.map { case (ts, v) =>
      (math.floor(v * 100).toLong, (ts / 1000000000L) * 2 <= mn + mx)
    }
    val a = scored.filter(_._2).map(_._1)
    val b = scored.filterNot(_._2).map(_._1)
    val dNum = scored.map(_._1).distinct.map { s =>
      math.abs(a.count(_ <= s).toLong * b.size - b.count(_ <= s).toLong * a.size)
    }.max
    assert(na == a.size.toLong && nb == b.size.toLong)
    assert(ksPpm == dNum * 1000000L / (a.size.toLong * b.size))
  }

  test("bucket-stitched Gini equals the directly sorted formula") {
    import spark.implicits._
    val rnd = new Random(17)
    // revenues spanning several stitch bands (band width = 10^6 cents),
    // with duplicated values to exercise the tie rule
    val orders = (0 until 500).map { i =>
      val custkey = (i % 180).toLong
      val price = (rnd.nextInt(40000) + 100) / 1.0
      (i.toLong, custkey, price)
    }
    val dir = fixtureDir()
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val r = SparkEntry.queries("q_gini_concentration")(spark, dir).collect().head
    val (n, total, giniPpm) = (r.getLong(0), r.getLong(1), r.getLong(2))

    val byCust = orders.groupBy(_._2).view
      .mapValues(_.map(o => math.floor(o._3 * 100).toLong).sum).toMap
    val xs = byCust.values.toSeq.sorted
    val s = xs.map(BigInt(_)).sum
    val rs = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = (2 * rs - BigInt(xs.size + 1) * s) * 1000000 /
      (BigInt(xs.size) * s)
    assert(n == byCust.size.toLong && total == s.toLong)
    assert(giniPpm == expected.toLong)
  }
}
