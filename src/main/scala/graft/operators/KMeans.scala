package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over integer-quantized vectors.
  *
  * Exactness: float centroid averaging is fold-order-sensitive, so a
  * distributed mean is not reproducible across engines or partitionings.
  * Quantizing each component to `floor((v + offset)·1e6 + 0.5)` longs
  * first makes every step — squared-L2 distances, argmin, and the
  * `sum div count` centroid update — pure BIGINT arithmetic: the same
  * result on any cluster size, and mirrorable in a SQL oracle. The
  * `offset` must bound |v| so quantized values are non-negative
  * (truncating and flooring integer division then agree across engines).
  *
  * Scale shape (the same as MLlib's k-means): centroids live on the
  * driver (k×dim longs — metadata-sized) and broadcast into the plan as
  * literals; each Lloyd update is ONE corpus scan + one hash aggregate
  * producing k×dim rows (map-side partials, nothing else shuffles); the
  * final assignment is a narrow map. Total: `updates`+1 scans, zero
  * corpus shuffles.
  *
  * Ties and empties are deterministic: argmin breaks ties by smallest
  * centroid id (struct ordering on (dist, cid)); a centroid that loses
  * all points keeps its previous position.
  */
object KMeans {

  /** Quantize a float-array column to non-negative micro-unit longs.
    * Requires |v| < offset for every component. */
  def quantize(vec: Column, offset: Double = 1.0, scale: Double = 1e6): Column =
    transform(vec, v => floor((v.cast("double") + offset) * scale + 0.5).cast("long"))

  /** Run `updates` Lloyd iterations and return the final assignment.
    *
    * @param quant   (idCol, qv: array<long>) — see [[quantize]]
    * @param idCol   unique long id; rows with id < k seed the centroids
    * @param k       cluster count
    * @param updates centroid-update rounds (each = one assign + one mean)
    * @return (idCol, cluster: int, dist2: long) — assignment under the
    *         final centroids, with its exact squared-L2 distance */
  def lloyd(quant: DataFrame, idCol: String, k: Int, updates: Int): DataFrame = {
    var centroids: Vector[(Int, Vector[Long])] =
      quant.filter(col(idCol) < k)
        .select(col(idCol).cast("int"), col("qv"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1).toVector))
        .sortBy(_._1).toVector
    require(centroids.size == k, s"need ids 0..${k - 1} as seeds, found ${centroids.size}")

    def assign(): DataFrame = {
      val cands = centroids.map { case (cid, c) =>
        struct(
          aggregate(
            zip_with(col("qv"), typedLit(c), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"),
          lit(cid).as("cid"))
      }
      quant
        .withColumn("__best", array_min(array(cands: _*)))
        .select(col(idCol), col("qv"),
          col("__best.cid").as("cluster"), col("__best.d").as("dist2"))
    }

    for (_ <- 1 to updates) {
      val updated = assign()
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(expr("sum(v) div count(1)").as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toVector }
      centroids = centroids.map { case (cid, c) => (cid, updated.getOrElse(cid, c)) }
    }
    assign().drop("qv")
  }
}
