package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

class BPESpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Reference single-threaded BPE: greedy first-occurrence apply. */
  private def referenceBpe(words: Map[String, Long],
      nMerges: Int): Seq[BPE.Merge] = {
    val vocab = mutable.Map(words.keys.map(w => w -> w.map(_.toString).toVector).toSeq: _*)
    val out = Vector.newBuilder[BPE.Merge]
    var step = 1
    var stop = false
    while (step <= nMerges && !stop) {
      val pc = mutable.Map.empty[(String, String), Long]
      for ((w, c) <- words; Seq(a, b) <- vocab(w).sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + c
      if (pc.isEmpty) stop = true
      else {
        val ((x, y), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        for (w <- vocab.keys) {
          val syms = vocab(w)
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
              merged += (x + y); i += 2
            } else { merged += syms(i); i += 1 }
          }
          vocab(w) = merged.result()
        }
        val nSym = vocab.values.flatten.toSet.size.toLong
        out += BPE.Merge(step, x, y, cnt, nSym)
        step += 1
      }
    }
    out.result()
  }

  test("learnMerges matches reference BPE on adversarial runs and ties") {
    // runs of identical chars exercise the odd-alignment overlap cases
    val words = Map[String, Long](
      "aaaaaa" -> 2L, "aaa" -> 5L, "banana" -> 3L, "bandana" -> 1L,
      "abab" -> 4L, "x" -> 9L, "lower" -> 2L, "lowest" -> 2L)
    val df = words.toSeq.toDF("w", "c")
    val got = BPE.learnMerges(df, "w", "c", nMerges = 5)
    assert(got == referenceBpe(words, 5))
  }

  test("randomized differential: 30 merge rounds over random small-alphabet words") {
    val rng = new Random(42)
    val words = (1 to 120).map { _ =>
      val len = 1 + rng.nextInt(10)
      (1 to len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val df = words.toSeq.toDF("w", "c")
    val got = BPE.learnMerges(df, "w", "c", nMerges = 30)
    val want = referenceBpe(words, 30)
    assert(got == want)
  }

  test("stops early when every word is a single symbol") {
    val words = Map("ab" -> 3L)
    val df = words.toSeq.toDF("w", "c")
    val got = BPE.learnMerges(df, "w", "c", nMerges = 10)
    // one merge fuses the only pair; afterwards no adjacency remains
    assert(got == Seq(BPE.Merge(1, "a", "b", 3L, 1L)))
  }
}
