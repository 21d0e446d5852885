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

  private def incr(standing: Seq[(Long, Long)],
      newEdges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.incrementalComponents(
        standing.toDF("id", "cluster_id"), newEdges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental: a bridge edge merges two standing clusters to the min label") {
    // standing: {1,2,3} labeled 1, {5,6} labeled 5
    val got = incr(
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)),
      Seq((3L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("incremental: one new doc bridging three clusters merges them transitively") {
    // clusters {1,2}, {5,6}, {8,9}; new doc 100 touches all three
    val got = incr(
      Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (8L, 8L), (9L, 8L)),
      Seq((100L, 2L), (100L, 6L), (100L, 9L)))
    assert(got.keySet == Set(1L, 2L, 5L, 6L, 8L, 9L, 100L))
    assert(got.values.toSet == Set(1L), s"all must merge to min label: $got")
  }

  test("incremental: drop-only pairs form new clusters; untouched clusters pass through") {
    val got = incr(
      Seq((1L, 1L), (2L, 1L)),
      Seq((50L, 60L), (60L, 70L))) // a brand-new chain, no standing contact
    assert(got == Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 60L -> 50L, 70L -> 50L))
  }

  test("incremental: an empty batch and intra-cluster edges change nothing") {
    val standing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
    assert(incr(standing, Seq.empty) == standing.toMap)
    assert(incr(standing, Seq((1L, 2L), (5L, 6L))) == standing.toMap)
  }

  test("incremental equals full recompute on random graphs split into two waves") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // wave 1 = edges among nodes < 20 ("standing"); wave 2 = the rest
      val wave1 = edges.filter(e => e._1 < 20 && e._2 < 20)
      val wave2 = edges.filterNot(e => e._1 < 20 && e._2 < 20)
      val standing = Components.connectedComponents(
        wave1.toDF("id_a", "id_b"), "id_a", "id_b")
      val got = Components.incrementalComponents(
          standing, wave2.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = run(edges)
      assert(got == full, s"trial $trial: incremental diverged from full")
    }
  }
}
