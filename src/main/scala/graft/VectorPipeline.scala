package graft

import graft.operators.{BinaryQuant, Knn, VectorIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The similarity-search path composed END TO END as one runnable
  * artifact — the embedding-side analog of [[CurationPipeline]]:
  *
  *   embeddings → binary-quantization index BUILD (fit + pack + persist)
  *   → APPEND a second corpus drop under the saved thresholds → SEARCH
  *   the loaded index (popcount coarse + cosine rerank) → RECALL
  *   evaluation against brute-force cosine
  *
  * Every stage is one of the library's operators (`BinaryQuant`,
  * `VectorIndex`, `Knn`); this main composes them and reports stage
  * counts plus measured recall. Scale shape is inherited: the fit is one
  * aggregate, codes are 8 B/vector, append never touches standing index
  * files, the coarse search shuffles histogram partials (never the pair
  * set), and only reranked candidates load vectors.
  *
  * Usage: graft.VectorPipeline [sfDir] [indexDir]
  * Prints one JSON line of stage counts + recall (ppm).
  */
object VectorPipeline {

  def run(spark: SparkSession, sfDir: String, indexDir: String,
      k: Int = 5, rerankWidth: Int = 32,
      nQueries: Int = 50): Seq[(String, Long)] = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val splitAt = n / 2

    // 1. build: fit thresholds on the FIRST corpus drop, pack, persist
    val first = emb.filter(col("vec_id") < splitAt)
    VectorIndex.buildBinary(first, "vec_id", "embedding", indexDir)
    val built = VectorIndex.loadBinaryCodes(spark, indexDir).count()

    // 2. append: the second drop encodes under the SAVED thresholds
    val second = emb.filter(col("vec_id") >= splitAt)
    VectorIndex.appendBinary(second, "vec_id", "embedding", indexDir)
    val indexed = VectorIndex.loadBinaryCodes(spark, indexDir).count()

    // 3. search the loaded index — the one-pass coarse stage (the scale
    //    path; spec-equal to the declarative form the oracle query runs)
    // both result frames are ≤ nQueries×k rows but carry the whole search
    // lineage — checkpoint so the recall arithmetic below (count +
    // intersect + count) doesn't re-run the index scan / brute KNN
    val approx = VectorIndex.searchBinary(spark, indexDir, emb,
        "vec_id", "embedding", _.filter(col("vec_id") < nQueries),
        k, rerankWidth, onePass = true)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val nApprox = approx.count()

    // 4. recall vs brute-force cosine over the same corpus/queries
    val exact = Knn.bruteTopK(emb, emb.filter(col("vec_id") < nQueries),
        "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val hits = approx.intersect(exact).count()
    val recallPpm = hits * 1000000L / math.max(1L, exact.count())

    Seq(
      "vectors" -> n,
      "built" -> built,
      "indexed" -> indexed,
      "searched" -> nApprox,
      "recall_ppm" -> recallPpm)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val indexDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_vpipe").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, sfDir, indexDir)
    println(counts.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
