package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Triangles.count(edges.toDF("a", "b")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Naive a<b<c triangle census over the canonicalized simple graph. */
  private def brute(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val deg = nodes.map(n => n -> e.count(p => p._1 == n || p._2 == n)).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val ns = nodes.toSeq.sorted
    val tris = (for {
      i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
      if e((ns(i), ns(j))) && e((ns(j), ns(k))) && e((ns(i), ns(k)))
    } yield 1).size.toLong
    (nodes.size.toLong, e.size.toLong, wedges, tris)
  }

  test("known shapes: triangle, square, K4, disconnected") {
    // one triangle
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 3L, 1L)))
    // 4-cycle: 4 wedges, no triangle
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 4L, 0L)))
    // K4: 4 triangles
    assert(run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 6L, 12L, 4L)))
    // triangle + isolated edge
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (8L, 9L))) == ((5L, 4L, 3L, 1L)))
  }

  test("self-loops, duplicates, and reversed orientations are canonicalized") {
    assert(run(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 2L)))
      == ((3L, 3L, 3L, 1L)))
  }

  test("randomized: degree-ordered count equals naive a<b<c census") {
    val rnd = new Random(7)
    for (trial <- 0 until 5) {
      val n = 12 + trial * 4
      val edges = for {
        _ <- 0 until (n * 3)
      } yield (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      assert(run(edges) == brute(edges), s"trial $trial: $edges")
    }
  }
}
