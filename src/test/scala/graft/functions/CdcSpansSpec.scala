package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpansSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  private def chunksOf(text: String): Seq[(Long, Long, String)] = {
    import s.implicits._
    Seq(text).toDF("text")
      .select(explode(Text.cdcSpans(col("text"))).as("p"), col("text"))
      .select(col("p.s"), col("p.e"),
        col("text").substr(col("p.s").cast("int"),
          (col("p.e") - col("p.s") + 1L).cast("int")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
  }

  test("spans tile the text exactly: contiguous, 1-based, full cover") {
    val text = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val spans = chunksOf(text)
    assert(spans.head._1 == 1L && spans.last._2 == text.length.toLong)
    spans.sliding(2).foreach {
      case Seq((_, e1, _), (s2, _, _)) => assert(s2 == e1 + 1)
      case _ =>
    }
    assert(spans.map(_._3).mkString == text)
  }

  test("short strings yield one whole-text chunk") {
    assert(chunksOf("tiny") == Seq((1L, 4L, "tiny")))
  }

  test("boundaries are content-defined: an early edit re-syncs") {
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna ") * 10
    val edited = base.patch(5, "XYZQ", 0) // insert 4 chars near the start
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(edited).map(_._3)
    assert(a.size > 3, s"corpus should split (got ${a.size} chunks)")
    // every chunk past the edited region is byte-identical in both runs —
    // the re-sync property; fixed-width chunking would shift them ALL
    val shared = a.toSet.intersect(b.toSet)
    val aTail = a.drop(2)
    assert(aTail.nonEmpty && aTail.forall(shared.contains),
      s"tail chunks should survive the edit (shared ${shared.size}/${a.size})")
  }

  test("boundary rule matches the documented hash condition") {
    val text = "abcdefgh" * 8
    val spans = chunksOf(text)
    // recompute the rule by hand for every interior boundary
    val P = 1000000007L
    def ph(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    spans.dropRight(1).foreach { case (_, e, _) =>
      val window = text.substring((e - 8).toInt, e.toInt)
      assert(ph(window) % 16 == 0, s"boundary at $e lacks the hash property")
    }
  }
}
