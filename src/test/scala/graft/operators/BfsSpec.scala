package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BfsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session
  import s.implicits._

  /** Driver-side reference BFS over an adjacency map. */
  private def refBfs(n: Int, edges: Seq[(Long, Long)],
      seeds: Set[Long]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .filterNot(dist.contains)
      next.foreach(v => dist += v -> d)
      frontier = next
    }
    dist
  }

  test("chain graph: hop distances truncate soundly at maxHops") {
    // 0 -> 1 -> 2 -> 3 -> 4, seed 0, 2 hops: node 3 and 4 unreached
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val nodes = (0L to 4L).map(n => (n, if (n == 0) Some(0L) else None))
      .toDF("node", "dist")
    val got = Bfs.run(nodes, edges, maxHops = 2).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> None, 4L -> None))
  }

  test("randomized differential vs driver-side BFS") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 5) {
      val n = 30
      val dirEdges = (1 to 80).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val seeds = (1 to 3).map(_ => rnd.nextInt(n).toLong).toSet
      val maxHops = n // enough rounds for full convergence
      val expect = refBfs(n, dirEdges, seeds)
      val nodes = (0L until n).map(k =>
        (k, if (seeds(k)) Some(0L) else None)).toDF("node", "dist")
      // run far fewer rounds than n: distances cap at diameter quickly,
      // but keep it exact by using 12 rounds on a 30-node graph
      val got = Bfs.run(nodes, dirEdges.toDF("src", "dst"), maxHops = 12)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      // truncate the reference identically: >12-hop nodes stay null
      val expectFull = (0L until n).map(k =>
        k -> expect.get(k).filter(_ <= 12L)).toMap
      assert(got == expectFull, s"trial $trial")
    }
  }
}
