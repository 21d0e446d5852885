package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale stress: replicate the documents corpus N× (offset ids, so
  * ~all content is cross-copy duplicated) and run the full MinHash+LSH
  * candidate pipeline. Prints one line: docs, candidate pairs, seconds.
  *
  * Usage: graft.Stress [sfDir] [copies]
  * The measured numbers live in SCALE.md ("Measured" table).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    spark.stop()
  }
}
