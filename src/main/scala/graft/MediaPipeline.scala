package graft

import graft.multimodal.Media
import graft.operators.{Components, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The multimodal curation path composed END TO END as one runnable
  * artifact — the media analog of [[CurationPipeline]]:
  *
  *   media items (binary payload + typed metadata) → payload gate →
  *   modality-routed perceptual hash (dHash for image/video,
  *   Haitsma–Kalker fingerprint for audio) → banded Hamming near-dup
  *   pairs per modality → connected-component dup clusters → keeper per
  *   cluster (largest payload, ties to smallest id) → partitioned
  *   parquet of survivors
  *
  * Every stage is one of the library's operators; this main composes
  * them and reports per-stage counts. Scale shape inherited from the
  * operators: the gate and hash are narrow per-row passes (payload bytes
  * never shuffle — 2 longs per item feed the dedup), the pair join moves
  * bandCount×N tiny rows, clustering shuffles the pair graph only, and
  * the final write is partitioned by media kind.
  *
  * Usage: graft.MediaPipeline [sfDir] [outDir]
  * Prints one JSON line of stage counts.
  */
object MediaPipeline {

  def run(spark: SparkSession, sfDir: String, outDir: String): Seq[(String, Long)] =
    runMedia(spark,
      Media.synthesizeCovering(Tables.documents(spark, sfDir), "doc_id", "text"),
      outDir)

  /** Same pipeline over an arbitrary media frame (media_id, kind, bytes,
    * width, height, sample_rate) — the entry specs and stress runs feed
    * directly. Dedup is MODALITY-ROUTED: image/video payloads hash with
    * [[Media.dHash]] (visual gradient signs), audio payloads with
    * [[Media.audioFingerprint]] (Haitsma–Kalker energy differences) —
    * each modality meets only its own hash space in the banded join (a
    * dHash and an audio fingerprint agreeing at Hamming ≤ tau would be
    * coincidence, not similarity), and the union of both pair sets
    * feeds one clustering + keeper pass. */
  def runMedia(spark: SparkSession, mediaDf: DataFrame, outDir: String,
      maxHamming: Int = 12, minBytes: Int = 32,
      audioTau: Int = 16): Seq[(String, Long)] = {
    import spark.implicits._
    val raw = mediaDf.count()

    // 1. payload gate: truncated/empty items carry no raster signal and
    //    would all collide near the blank hash — drop them first.
    //    minBytes ≥ 32 also guarantees every audio item spans at least
    //    one fingerprint window.
    val gated = mediaDf.filter(length(col("bytes")) >= minBytes)
      .localCheckpoint(true) // consumed by hash, sizes, and the final anti-join
    val afterGate = gated.count()

    // 2. per-modality hash: 2 longs per item — the only thing dedup shuffles
    val visual = Media.dHash(
        gated.filter(col("kind") =!= "audio").as[Media.MediaRow])
      .toDF().localCheckpoint(true)
    val audio = Media.audioFingerprint(
        gated.filter(col("kind") === "audio").as[Media.MediaRow])
      .toDF().localCheckpoint(true)

    // 3. near-dup pairs via the banded Hamming join, per modality — band
    //    width derived from each hash table's own size
    //    (MinHashLSH.bandBitsFor), recall exactly 1.0 at any width via
    //    sub-radius probe enumeration
    val pairs = MinHashLSH.hammingBandPairs(
        visual, "media_id", "ph_hi", "ph_lo", maxHamming)
      .unionByName(MinHashLSH.hammingBandPairs(
        audio, "media_id", "fp_hi", "fp_lo", audioTau))
    val nPairs = pairs.count()

    // 4. transitive closure over the pair graph
    val comps = Components.connectedComponentsStar(
      pairs.select(col("id_a"), col("id_b")), "id_a", "id_b")
      .localCheckpoint(true)
    val clustered = comps.count()
    val nClusters = comps.select(col("cluster_id")).distinct().count()

    // 5. keeper per cluster: largest payload, ties to the smallest id
    val sized = comps.join(
      gated.select(col("media_id").as("id"),
        length(col("bytes")).cast("long").as("__nb")),
      "id")
    val keepers = sized.groupBy(col("cluster_id"))
      .agg(max_by(col("id"), struct(col("__nb"), -col("id"))).as("keeper_id"))
    // no broadcast() hint: keepers has one row per dup cluster, which at
    // corpus scale is corpus-order, not dimension-order — a forced hint
    // builds an unbounded driver-side table. Plain equi-join on
    // cluster_id; AQE broadcasts when it actually fits.
    val dropIds = sized.join(keepers, Seq("cluster_id"))
      .filter(col("id") =!= col("keeper_id"))
      .select(col("id").as("media_id"))
    // counted independently (not derived as clustered − clusters) so the
    // spec's count-algebra assertion checks the keeper policy for real
    val dropped = dropIds.count()
    val survivors = gated.join(dropIds, Seq("media_id"), "left_anti")
      .localCheckpoint(true)

    // 6. partitioned write (by kind — the layout downstream decoders read)
    survivors.write.mode("overwrite").partitionBy("kind").parquet(outDir)
    val written = spark.read.parquet(outDir).count()

    Seq("raw" -> raw, "after_gate" -> afterGate, "neardup_pairs" -> nPairs,
      "clustered_items" -> clustered, "dup_clusters" -> nClusters,
      "dropped" -> dropped, "written" -> written)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else s"/tmp/graft_media_${System.nanoTime()}"
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
