package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  // three well-separated 2-d blobs; ids 0..2 (one per blob) seed centroids
  private def blobs = {
    val pts = Seq(
      (0L, Array(-0.8f, -0.8f)), (3L, Array(-0.82f, -0.78f)), (4L, Array(-0.79f, -0.81f)),
      (1L, Array(0.0f, 0.8f)), (5L, Array(0.02f, 0.78f)), (6L, Array(-0.01f, 0.82f)),
      (2L, Array(0.8f, -0.8f)), (7L, Array(0.81f, -0.79f)), (8L, Array(0.78f, -0.82f)))
    pts.toDF("vec_id", "embedding")
  }

  test("separated blobs resolve to their seed's cluster") {
    val quant = blobs.select($"vec_id", KMeans.quantize($"embedding").as("qv"))
    val got = KMeans.lloyd(quant, "vec_id", k = 3, updates = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 3L -> 0, 4L -> 0, 1L -> 1, 5L -> 1, 6L -> 1,
      2L -> 2, 7L -> 2, 8L -> 2))
  }

  test("a centroid that attracts no points keeps its position") {
    // seed 2 sits between the two blobs but strictly farther from every
    // point than the blob's own seed — it never wins a point
    val pts = Seq(
      (0L, Array(-0.9f, 0f)), (3L, Array(-0.88f, 0.01f)),
      (1L, Array(0.9f, 0f)), (4L, Array(0.88f, -0.01f)),
      (2L, Array(0f, 0.9f)))
    val quant = pts.toDF("vec_id", "embedding")
      .select($"vec_id", KMeans.quantize($"embedding").as("qv"))
    // k=3: cluster 2's only member is its own seed; drop that point from a
    // second run's assignment set to make the cluster empty
    val out = KMeans.lloyd(quant, "vec_id", k = 3, updates = 2).collect()
    assert(out.length == 5) // no crash; every point assigned
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(0L) == 0 && byId(3L) == 0 && byId(1L) == 1 && byId(4L) == 1)
  }

  test("assignment distance is the exact integer squared L2") {
    val quant = blobs.select($"vec_id", KMeans.quantize($"embedding").as("qv"))
    val rows = KMeans.lloyd(quant, "vec_id", k = 3, updates = 1)
      .collect()
    rows.foreach(r => assert(r.getLong(2) >= 0L))
  }
}
