package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential tests for q_winnow_fingerprint and q_collocations: the
  * array-pipeline formulations must equal plain-Scala reference
  * implementations on randomized fixtures, and winnowing must honor its
  * defining guarantee (two documents sharing a substring of length >=
  * k+w-1 share a fingerprint hash).
  */
class WinnowCollocationSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private val P = 1000000007L
  private val K = 8
  private val W = 4

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)

  /** Reference winnow: distinct (hash, position) pairs, rightmost-min
    * selection per window — the textbook definition, no packing tricks. */
  private def winnow(text: String): Option[Seq[(Long, Int)]] = {
    if (text.length < K) return None
    val hs = (0 to text.length - K).map(i => polyHash(text.substring(i, i + K)))
    if (hs.length < W) return None
    Some((0 to hs.length - W).map { p =>
      val m = (p until p + W).map(hs).min
      val j = (p until p + W).filter(hs(_) == m).max
      (hs(j), j)
    }.distinct)
  }

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_winnow_fixture").toString

  test("winnow aggregates equal the reference implementation, incl. short docs") {
    import spark.implicits._
    val rnd = new Random(17)
    // tiny alphabet forces k-gram hash collisions, exercising the
    // rightmost-min tie-break; lengths straddle the k and k+w-1 guards
    val docs = (0 until 120).map { i =>
      val len = rnd.nextInt(60) + 3
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val dir = fixtureDir()
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q_winnow_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val row = rows(id)
      winnow(text) match {
        case Some(fps) =>
          assert(row.getLong(1) == text.length - K + 1, s"n_grams doc $id")
          assert(row.getLong(2) == fps.size.toLong, s"n_fp doc $id")
          assert(row.getLong(3) == fps.map(_._1).sum, s"fp_sum doc $id")
          assert(row.getLong(4) == fps.map(_._1).min, s"fp_min doc $id")
          assert(row.getLong(5) == fps.map(_._1).max, s"fp_max doc $id")
        case None =>
          assert(row.isNullAt(2) && row.isNullAt(3), s"short doc $id")
      }
    }
  }

  test("shared substring of length k+w-1 implies a shared fingerprint hash") {
    val rnd = new Random(41)
    val planted = "qwertyuiopa" // k+w-1 = 11 chars
    (0 until 25).foreach { _ =>
      def doc(): String = {
        val pre = (0 until rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        val post = (0 until rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        pre + planted + post
      }
      val (a, b) = (winnow(doc()).get, winnow(doc()).get)
      assert(a.map(_._1).toSet.intersect(b.map(_._1).toSet).nonEmpty)
    }
  }

  test("collocation lift matches exact BigInt reference and is rank-ordered") {
    import spark.implicits._
    val rnd = new Random(7)
    // vocabulary with one strongly collocated pair and uniform noise
    val docs = (0 until 80).map { i =>
      val toks = (0 until 40).flatMap { _ =>
        if (rnd.nextInt(4) == 0) Seq("new", "york")
        else Seq(Seq("the", "a", "of", "in", "data")(rnd.nextInt(5)))
      }
      (i.toLong, toks.mkString(" "))
    }
    val dir = fixtureDir()
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q_collocations")(spark, dir).collect()

    // reference counts
    val tokss = docs.map(_._2.split(" ", -1).toSeq)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tokss.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val m = bi.values.sum
    def lift(w1: String, w2: String): Long =
      (BigInt(bi((w1, w2))) * n * n * 1000000 /
        (BigInt(m) * uni(w1) * uni(w2))).toLong

    assert(out.nonEmpty)
    out.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == bi((w1, w2)), s"n_xy $w1 $w2")
      assert(r.getLong(5) == lift(w1, w2), s"lift $w1 $w2")
    }
    // descending lift with (w1, w2) tie-break
    val keys = out.map(r => (-r.getLong(5), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
    // the planted collocation dominates
    assert(out.head.getString(0) == "new" && out.head.getString(1) == "york")
  }
}
