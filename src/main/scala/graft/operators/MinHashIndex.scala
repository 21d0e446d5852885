package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash SIGNATURE index — the text-modality twin of
  * [[HammingIndex]]: the standing corpus's k-perm minhash signatures
  * persist once (id + k longs ≈ 0.5 KB/item at k=64 — the corpus text
  * itself never re-shingles), and ingest-time dedup probes the saved
  * artifact with the asymmetric banded bucket join: drop docs hash with
  * the SAME fused signature expression, meet the standing buckets on
  * (band, md5-of-slice) keys, and only candidates estimate Jaccard from
  * the two signature arrays. Same storage contract as every index here
  * (manifest-versioned batch-partitioned payload, tombstones), so
  * [[VectorIndex.deleteIds]]/[[VectorIndex.compact]] run unchanged —
  * GDPR removal from the dedup index is the same one-liner as removal
  * from the ANN indexes.
  *
  * Signature geometry (k, shingle size) travels in `path/meta`: append
  * and probe read it and can never drift from the build — signatures are
  * only comparable under one permutation family, the same never-refit
  * contract as the PQ quantizer.
  *
  * Scale: probes shuffle bands×(drop + standing) tiny bucket rows and
  * join signatures only for candidates; the standing side is read, never
  * recomputed. No document text crosses any shuffle.
  */
object MinHashIndex {

  private def sigOf(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingle: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("vec_id"),
        graft.functions.MinHashSigExpr(col(textCol), k, shingle).as("sig"))
      .filter(size(col("sig")) > 0)

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    val m = spark.read.parquet(
      IndexManifest.artifactDirAt(spark, path, "meta")).head()
    (m.getAs[Int]("k"), m.getAs[Int]("shingle"))
  }

  /** Shingle + sign the standing corpus once and persist (`__batch=-1`),
    * with the signature geometry alongside. Building into a path that
    * already holds an index commits the NEXT manifest version — a
    * rebuild atomically replaces the old payload for new readers instead
    * of being silently ignored by the version-max rule. The commit
    * marker lands LAST, after payload and geometry: a crash mid-build
    * leaves the previous version current, never a committed index whose
    * meta is missing. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      k: Int = 64, shingle: Int = 3): Unit = {
    val spark = docs.sparkSession
    val v = IndexManifest.nextBuildVersion(spark, path)
    spark.sql(s"SELECT $k AS k, $shingle AS shingle")
      .write.mode("overwrite").parquet(s"$path/meta_v$v")
    sigOf(docs, idCol, textCol, k, shingle)
      .withColumn("__batch", lit(-1L))
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/codes_v$v")
    VectorIndex.commitBuild(spark, path, v, Seq("meta"))
  }

  /** Sign new docs under the SAVED geometry and append. Pass the
    * streaming `batchId` for exactly-once replay, as everywhere. */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
      batchId: Option[Long] = None): Unit = {
    val (k, shingle) = meta(docs.sparkSession, path)
    VectorIndex.writeCodes(sigOf(docs, idCol, textCol, k, shingle),
      path, batchId)
  }

  /** The live signature table: (vec_id, sig), tombstones masked. The
    * explicit schema keeps an EMPTY index readable (zero-row builds
    * write no footers to infer from), matching [[HammingIndex.load]]. */
  def load(spark: SparkSession, path: String): DataFrame =
    VectorIndex.liveCodesResolved(spark, path,
      IndexManifest.resolve(spark, path),
      "vec_id LONG, sig ARRAY<LONG> NOT NULL, __batch LONG")

  /** Probe a drop against the live index: (id_p, id_r, est_ppm) for every
    * candidate pair at estimated Jaccard ≥ `minEstPpm` — drop docs never
    * pairwise-join each other, only the index. Result is materialized
    * (localCheckpoint) so the signature caches' lifetime is bounded to
    * this call, the [[MinHashLSH.candidatePairs]] discipline. */
  def probe(drops: DataFrame, idCol: String, textCol: String, path: String,
      bands: Int = 16, minEstPpm: Long = 500000L): DataFrame = {
    val spark = drops.sparkSession
    val (k, shingle) = meta(spark, path)
    require(k % bands == 0, s"bands must divide k ($bands vs $k)")
    val r = k / bands
    val standing = load(spark, path).cache()
    val dropSig = sigOf(drops, idCol, textCol, k, shingle).cache()

    def buckets(sig: DataFrame): DataFrame = sig
      .select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bkey",
        md5(concat_ws(",", transform(
          slice(col("sig"), col("__band") * r + 1, lit(r)),
          x => x.cast("string")))))
      .select(col("vec_id"), col("__band"), col("__bkey"))

    val cand = buckets(dropSig).as("a")
      .join(buckets(standing).as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bkey") === col("b.__bkey"))
      .select(col("a.vec_id").as("id_p"), col("b.vec_id").as("id_r"))
      .distinct()

    val out = cand
      .join(dropSig.select(col("vec_id").as("id_p"), col("sig").as("__sa")),
        "id_p")
      .join(standing.select(col("vec_id").as("id_r"), col("sig").as("__sb")),
        "id_r")
      .withColumn("__match",
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y),
          b => b)))
      // multiply before the integer division — exact for every k, not
      // just the k | 1e6 defaults (see MinHashLSH.candidatePairs)
      .withColumn("est_ppm", expr(s"cast(__match AS bigint) * 1000000 div $k"))
      .filter(col("est_ppm") >= minEstPpm)
      .select(col("id_p"), col("id_r"), col("est_ppm"))

    val materialized = out.localCheckpoint(true)
    standing.unpersist()
    dropSig.unpersist()
    materialized
  }

  /** Per-drop-doc dup verdicts: (doc_id, n_dup_matches) for EVERY probe
    * doc, zero when clean (including docs too short to shingle). */
  def verdicts(drops: DataFrame, idCol: String, textCol: String,
      path: String, bands: Int = 16, minEstPpm: Long = 500000L): DataFrame = {
    val matches = probe(drops, idCol, textCol, path, bands, minEstPpm)
      .groupBy(col("id_p")).agg(count(lit(1)).as("__nm"))
    drops.select(col(idCol).cast("long").as("doc_id"))
      .join(matches, col("doc_id") === col("id_p"), "left")
      .select(col("doc_id"), coalesce(col("__nm"), lit(0L)).as("n_dup_matches"))
  }
}
