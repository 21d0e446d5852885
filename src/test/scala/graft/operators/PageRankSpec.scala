package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
                  iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.run(nodes.toDF("node"), edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: one iteration accumulates damped in-mass exactly") {
    // 1→0 and 2→0, unit weights. After one round:
    //   r(0) = 150000 + 85·(1e6 + 1e6)/100 = 1_850_000
    //   r(1) = r(2) = 150000 (no in-edges; their out-mass left)
    val r = run(Seq(0L, 1L, 2L), Seq((1L, 0L, 1L), (2L, 0L, 1L)), iters = 1)
    assert(r == Map(0L -> 1850000L, 1L -> 150000L, 2L -> 150000L))
  }

  test("weighted out-edges split rank proportionally with integer division") {
    // 0→1 (w=3), 0→2 (w=1): contributions 750000 and 250000.
    val r = run(Seq(0L, 1L, 2L), Seq((0L, 1L, 3L), (0L, 2L, 1L)), iters = 1)
    assert(r(1) == 150000L + 85L * 750000L / 100L)
    assert(r(2) == 150000L + 85L * 250000L / 100L)
    assert(r(0) == 150000L)
  }

  test("isolated node keeps the base rank across iterations") {
    val r = run(Seq(0L, 1L, 9L), Seq((0L, 1L, 1L), (1L, 0L, 1L)), iters = 3)
    assert(r(9L) == 150000L)
  }

  test("2-cycle converges toward the fixpoint ~1e6 and conserves non-dangling mass") {
    // 0↔1: each round r = 150000 + 85%·(other's r). Fixpoint 1e6.
    val r = run(Seq(0L, 1L), Seq((0L, 1L, 1L), (1L, 0L, 1L)), iters = 10)
    assert(r(0L) == r(1L))
    assert(math.abs(r(0L) - 1000000L) < 200L) // geometric approach, 0.85^10 ≈ 0.2
  }

  test("self-loop feeds rank back to itself") {
    val r = run(Seq(0L), Seq((0L, 0L, 1L)), iters = 1)
    assert(r(0L) == 1000000L) // 150000 + 85% of its own 1e6
  }
}
