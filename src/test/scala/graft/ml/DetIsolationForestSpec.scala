package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The Spark walk is verified against an INDEPENDENT driver-side Scala
  * replay of the same deterministic-split definition (hash constants from
  * the operator object, logic re-derived from the scaladoc — not shared
  * code), so a bug in the Column unrolling can't self-confirm. */
class DetIsolationForestSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private val T = 8
  private val D = 8

  private def data = {
    val rng = new Random(3)
    val normal = (1 to 300).map(i =>
      (i.toLong, 10.0 + rng.nextGaussian(), 5.0 + rng.nextGaussian()))
    val outliers = Seq((901L, 120.0, -60.0), (902L, -90.0, 95.0))
    normal ++ outliers
  }

  /** Driver-side replay: per (row, tree) walk with interval narrowing. */
  private def replayScores(rows: Seq[(Long, Double, Double)]): Map[Long, Long] = {
    import DetIsolationForest._
    val feats = rows.map(r => Array(r._2, r._3))
    val nf = 2
    val gmin = Array.tabulate(nf)(i => feats.map(_(i)).min)
    val gmax = Array.tabulate(nf)(i => feats.map(_(i)).max)
    // leaf node per (rowIdx, tree)
    val leaves = Array.ofDim[Long](rows.size, T)
    for (r <- rows.indices; t <- 0 until T) {
      var nid = 0L
      val lo = gmin.clone(); val hi = gmax.clone()
      for (d <- 0 until D) {
        val h1 = (t * A1 + d * A2 + nid * A3 + C1) % Mod
        val h2 = (t * B1 + d * B2 + nid * B3 + C2) % Mod
        val f = (h1 % nf).toInt
        val u = h2.toDouble / Mod.toDouble
        val thr = lo(f) + u * (hi(f) - lo(f))
        val b = if (feats(r)(f) >= thr) 1L else 0L
        nid = nid * 2 + b
        if (b == 1) lo(f) = thr else hi(f) = thr
      }
      leaves(r)(t) = nid
    }
    // occupancy per (tree, depth-prefix)
    val occ = Array.tabulate(D) { dIdx =>
      val d = dIdx + 1
      rows.indices.flatMap(r => (0 until T).map(t =>
        (t, leaves(r)(t) >> (D - d)))).groupBy(identity).map { case (k, v) => k -> v.size }
    }
    rows.indices.map { r =>
      val total = (0 until T).map { t =>
        val iso = (1 to D).find(d => occ(d - 1)((t, leaves(r)(t) >> (D - d))) == 1)
          .getOrElse(D).toLong
        val cD = occ(D - 1)((t, leaves(r)(t))).toLong
        iso * 1000000L + math.floor((cD - 1) * 2000000L / cD.toDouble).toLong
      }.sum
      rows(r)._1 -> total
    }.toMap
  }

  test("distributed scores equal the independent driver-side replay exactly") {
    val rows = data
    val df = rows.toDF("id", "a", "b")
    val got = DetIsolationForest.score(df, Seq("id"), Seq("a", "b"), T, D)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = replayScores(rows)
    assert(got.size == rows.size)
    assert(got == want)
  }

  test("planted outliers take the two lowest (most anomalous) scores") {
    val df = data.toDF("id", "a", "b")
    val bottom = DetIsolationForest.score(df, Seq("id"), Seq("a", "b"), T, D)
      .orderBy("iso_score", "id").select("id").as[Long].take(2).toSet
    assert(bottom == Set(901L, 902L))
  }

  test("plan shape: occupancy joins broadcast, no sort-merge join (pre-checkpoint)") {
    val df = data.toDF("id", "a", "b")
    val leaf = DetIsolationForest.leafPaths(df, Seq("id"), Seq("a", "b"), T, D)
    val plan = DetIsolationForest.scorePlan(leaf, Seq("id"), T, D)
      .queryExecution.executedPlan
    val rendered = plan.toString
    assert(!rendered.contains("SortMergeJoin"),
      "occupancy joins must broadcast — counts are <= nTrees * 2^maxDepth rows")
    assert(rendered.contains("BroadcastHashJoin"))
  }
}
