package graft

import graft.operators.{Components, MinHashLSH, Packing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data path composed END TO END as one runnable artifact —
  * the curation analog of the reference's telemetry `Pipeline`:
  *
  *   documents → quality gate → exact dedup → near-dup dedup (LSH +
  *   connected components, cluster-min canonical) → sequence packing →
  *   deterministic sharding → partitioned parquet shards
  *
  * Every stage is one of the library's operators; this main just
  * composes them and reports per-stage survivor counts. Scale shape is
  * inherited from the operators: the quality gate is narrow, both dedups
  * shuffle digests/signatures (never payloads), packing's prefix sum is
  * bucket-stitched, and the shard write is hash-partitioned — no stage
  * funnels the corpus through one task.
  *
  * Usage: graft.CurationPipeline [sfDir] [outDir]
  * Prints one JSON line of stage counts.
  */
object CurationPipeline {

  def run(spark: SparkSession, sfDir: String, outDir: String,
      seqLen: Long = 128L, nShards: Int = 8): Seq[(String, Long)] =
    runDocs(spark, Tables.documents(spark, sfDir), outDir, seqLen, nShards)

  /** Same pipeline over an arbitrary documents frame (doc_id, text,
    * n_chars, ...) — the entry the stress harness replicates into. */
  def runDocs(spark: SparkSession, docs: DataFrame, outDir: String,
      seqLen: Long = 128L, nShards: Int = 8): Seq[(String, Long)] = {
    val raw = docs.count()

    // 1. quality gate: length bounds + unique-token ratio (integer ppm)
    val scored = docs
      .withColumn("n_toks", size(split(col("text"), " ")))
      .withColumn("uniq_ppm",
        expr("size(array_distinct(split(text, ' '))) * 1000000L div n_toks"))
      .filter(col("n_chars") >= 20 && col("n_toks") >= 5 &&
        col("uniq_ppm") >= 300000)
      .drop("uniq_ppm")
    val afterQuality = scored.count()

    // 2. exact dedup: group by normalized digest, keep the min doc_id —
    //    digests cross the shuffle, payloads never do
    val canonicalIds = scored
      .withColumn("__digest", md5(lower(col("text"))))
      .groupBy(col("__digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // three consumers (count, LSH signatures, final anti-join): cut the
    // lineage once so none recomputes the gate+dedup chain from the scan
    val exactDeduped = scored.join(canonicalIds, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val afterExact = exactDeduped.count()

    // 3. near-dup dedup: LSH candidates at >= 80% estimated Jaccard →
    //    transitive closure (star contraction — near-dup graphs are
    //    usually shallow, but chains cost nothing here) → keep each
    //    cluster's min doc_id
    val pairs = MinHashLSH.candidatePairs(
      exactDeduped, "doc_id", "text", minEstPpm = 800000L)
    val clusters = Components.connectedComponentsStar(pairs, "id_a", "id_b")
    val dupIds = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    // same multi-consumer discipline as exactDeduped: count, packing, and
    // the final shard join must not re-run the anti-join chain
    val clean = exactDeduped.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val afterNearDup = clean.count()

    // 4. pack the token stream into fixed-length training sequences
    val packed = Packing.packSequences(clean, "doc_id", col("n_toks"), seqLen)
      .localCheckpoint(true)
    val nSeqs = packed
      .agg(coalesce(max(col("end_seq")) + 1, lit(0L))).head().getLong(0)

    // 5. deterministic shard + write: reproducible multiplicative hash,
    //    hash-partitioned parquet layout
    val sharded = clean.join(packed, Seq("doc_id"))
      .withColumn("shard",
        pmod(col("doc_id") * 2654435761L, lit(nShards.toLong)).cast("int"))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val written = spark.read.parquet(outDir).count()

    Seq("raw" -> raw, "after_quality" -> afterQuality,
      "after_exact_dedup" -> afterExact, "after_near_dup" -> afterNearDup,
      "packed_sequences" -> nSeqs, "written" -> written)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else s"/tmp/graft_curation_${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = run(spark, sfDir, outDir)
    println(counts.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", s""","out":"$outDir"}"""))
    spark.stop()
  }
}
