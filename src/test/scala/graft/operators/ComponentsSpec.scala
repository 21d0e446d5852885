package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, star, and singleton-pair components all label by min id") {
    // chain 10-11-12-13-14 (diameter 4: exercises multi-round
    // propagation), star 20-{21,22,23}, pair 30-31
    val comp = run(Seq(
      (11L, 10L), (12L, 11L), (13L, 12L), (14L, 13L),
      (20L, 21L), (20L, 22L), (23L, 20L),
      (31L, 30L)))
    assert(comp == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("star contraction labels a 200-node chain in O(log n) rounds") {
    import spark.implicits._
    // diameter 199: min-label propagation would need ~200 rounds, the
    // large-star/small-star form stays well under its default 50
    val chain = (0L until 199L).map(i => (i, i + 1))
    val comp = Components
      .connectedComponentsStar(chain.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 200)
    assert(comp.values.forall(_ == 0L))
  }

  test("star contraction matches min-label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 50).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val byStar = Components
        .connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byLabel = run(edges)
      assert(byStar == byLabel, s"trial $trial")
    }
  }

  test("two chains merged by a bridge edge collapse to one component") {
    val comp = run(Seq(
      (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L),
      (3L, 5L))) // bridge
    assert(comp.values.toSet == Set(1L))
    assert(comp.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L))
  }
}
