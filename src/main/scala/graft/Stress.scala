package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress harness — replicates a corpus N× (offset ids) and runs a
  * scale-path pipeline end to end. Prints one JSON line.
  *
  * Usage: graft.Stress [sfDir] [copies] [mode]
  *   mode "dedup" (default): MinHash+LSH candidate pairs over N× documents
  *   mode "knn":             sign-LSH bucketed top-1 NN over N× embeddings
  * The measured numbers live in SCALE.md ("Measured" table).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 20
    val mode = if (args.length > 2) args(2) else "dedup"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "knn" =>
        val emb0 = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val big = (0 until copies).map(i =>
            emb0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val t0 = System.nanoTime()
        val bucketed = big.withColumn("bucket",
          operators.Knn.signBucket(col("embedding"), 64, 8))
        val nn = operators.Knn.nnWithinBucket(bucketed, "vec_id", "embedding", "bucket")
        val nr = nn.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"vectors":$n%d,"nn_rows":$nr%d,"seconds":$dt%.1f}""")

      case _ =>
        val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val big = (0 until copies).map(i =>
            docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _).cache()
        val n = big.count()
        val t0 = System.nanoTime()
        val pairs = operators.MinHashLSH.candidatePairs(
          big, "doc_id", "text", k = 64, bands = 16, minEstPpm = 500000L)
        val np = pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"docs":$n%d,"candidate_pairs":$np%d,"seconds":$dt%.1f}""")
    }
    spark.stop()
  }
}
