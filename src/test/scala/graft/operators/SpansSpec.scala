package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SpansSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private def run(rows: Seq[(Long, Long)], width: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Spans.coveredLength(rows.toDF("k", "p"), "k", "p", width)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Brute union of [p, p+width) intervals. */
  private def brute(ps: Seq[Long], width: Int): Long =
    ps.flatMap(p => p until p + width).distinct.size.toLong

  test("disjoint, touching, overlapping, and nested intervals") {
    // key 1: [0,8) ∪ [8,16) touching → 16; key 2: [0,8) ∪ [4,12) → 12;
    // key 3: [0,8) ∪ [2,10) ∪ [100,108) → 18; key 4: duplicate starts → 8
    val r = run(Seq(
      (1L, 0L), (1L, 8L),
      (2L, 0L), (2L, 4L),
      (3L, 0L), (3L, 2L), (3L, 100L),
      (4L, 5L), (4L, 5L)), width = 8)
    assert(r(1L) == ((2L, 16L)))
    assert(r(2L) == ((2L, 12L)))
    assert(r(3L) == ((3L, 18L)))
    assert(r(4L) == ((2L, 8L)))
  }

  test("randomized: covered length equals brute-force interval union") {
    val rnd = new Random(42)
    val rows = for {
      k <- 0L until 20L
      _ <- 0 until rnd.nextInt(30)
    } yield (k, rnd.nextInt(100).toLong)
    val width = 8
    val got = run(rows, width)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ps = rs.map(_._2)
      assert(got(k) == ((ps.size.toLong, brute(ps, width))),
        s"key $k: positions ${ps.sorted}")
    }
  }
}
