package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def run(nodes: Seq[(Long, Option[Long])], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Option[Long]] = {
    import spark.implicits._
    val n = nodes.toDF("node", "seed")
    val e = edges.toDF("src", "dst")
    LabelProp.run(n, e, iters).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  /** Driver-side reference: clamped seeds, in-neighbor majority,
    * smallest-label ties, null when no labeled in-neighbor. */
  private def brute(nodes: Seq[(Long, Option[Long])], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Option[Long]] = {
    val seed = nodes.toMap
    var lab: Map[Long, Option[Long]] = seed
    for (_ <- 1 to iters) {
      val next = nodes.map { case (v, s) =>
        v -> (s match {
          case Some(_) => s
          case None =>
            val incoming = edges.filter(_._2 == v).flatMap(e => lab(e._1))
            if (incoming.isEmpty) None
            else {
              val counts = incoming.groupBy(identity).view.mapValues(_.size)
              Some(counts.toSeq.maxBy { case (l, c) => (c, -l) }._1)
            }
        })
      }.toMap
      lab = next
    }
    lab
  }

  test("chain: label walks one hop per round from a clamped seed") {
    val nodes = Seq((1L, Some(7L)), (2L, None), (3L, None), (4L, None))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(nodes, edges, 1) ==
      Map(1L -> Some(7L), 2L -> Some(7L), 3L -> None, 4L -> None))
    assert(run(nodes, edges, 3).forall(_._2.contains(7L)))
  }

  test("majority vote with smallest-label tie-break; isolated stays null") {
    // node 5 hears 1 from two neighbors and 2 from two others → tie → 1
    val nodes = Seq((1L, Some(1L)), (2L, Some(1L)), (3L, Some(2L)),
      (4L, Some(2L)), (5L, None), (9L, None))
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
    val got = run(nodes, edges, 1)
    assert(got(5L) == Some(1L))
    assert(got(9L) == None)
  }

  test("randomized: distributed rounds equal the driver-side reference") {
    val rnd = new Random(23)
    for (trial <- 0 until 3) {
      val n = 14
      val nodes = (0L until n).map(v =>
        (v, if (rnd.nextInt(3) == 0) Some(rnd.nextInt(3).toLong) else None))
      val edges = (0 until n * 2).map(_ =>
        (rnd.nextInt(n.toInt).toLong, rnd.nextInt(n.toInt).toLong))
        .filter(e => e._1 != e._2)
      assert(run(nodes, edges, 3) == brute(nodes, edges, 3),
        s"trial $trial nodes=$nodes edges=$edges")
    }
  }
}
