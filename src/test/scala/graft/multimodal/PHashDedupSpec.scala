package graft.multimodal

import graft.{SparkSpec, Tables}
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash (dHash) near-dedup: hash construction invariants and
  * the banded Hamming join's exactness vs the quadratic self-join. */
class PHashDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def docMedia(limit: Int) = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(limit)
    Media.synthesizeCovering(docs, "doc_id", "text").as[Media.MediaRow]
  }

  test("dHash: deterministic, halves are non-negative 32-bit values") {
    val a = Media.dHash(docMedia(60)).collect().map(r => (r.media_id, r.ph_hi, r.ph_lo)).sorted
    val b = Media.dHash(docMedia(60)).collect().map(r => (r.media_id, r.ph_hi, r.ph_lo)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    assert(a.forall { case (_, hi, lo) =>
      hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32)
    })
    // covering dims must produce content-dependent hashes, not one shared
    // degenerate value
    assert(a.map { case (_, hi, lo) => (hi, lo) }.distinct.length > 1)
  }

  test("dHash matches the by-hand gradient map on a crafted payload") {
    // 81-char payload → n=81, w=9, h=9; thumb(y,x) = bytes[(y*9/8)*9 + x]
    // (w=tw=9 ⇒ sx=x). Rows alternate ascending/flat so expected bits are
    // computable by hand through the same kernel.
    val payload = (0 until 81).map { i =>
      val y = i / 9
      if (y % 2 == 0) ('a' + (i % 9)).toChar else 'm'
    }.mkString
    val df = Seq((7L, payload)).toDF("doc_id", "text")
    val media = Media.synthesizeCovering(df, "doc_id", "text").as[Media.MediaRow]
    val row = Media.dHash(media).head()

    val bytes = payload.getBytes("UTF-8")
    var lo = 0L; var hi = 0L
    for (j <- 0 until 64) {
      val y = j / 8; val x = j % 8
      val sy = y * 9 / 8 // th=8, h=9
      val aPx = bytes(sy * 9 + x) & 0xff
      val bPx = bytes(sy * 9 + x + 1) & 0xff
      if (aPx > bPx) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
    }
    assert(row.ph_hi == hi && row.ph_lo == lo)
  }

  test("banded Hamming pairs ≡ quadratic self-join (pigeonhole exact)") {
    val ph = Media.dHash(docMedia(120)).toDF().cache()
    val banded = MinHashLSH.hammingBandPairs(ph, "media_id", "ph_hi", "ph_lo",
        maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ham = bit_count(col("a.ph_hi").bitwiseXOR(col("b.ph_hi"))) +
      bit_count(col("a.ph_lo").bitwiseXOR(col("b.ph_lo")))
    val quadratic = ph.as("a").join(ph.as("b"),
        col("a.media_id") < col("b.media_id") && ham <= 12)
      .select(col("a.media_id"), col("b.media_id"), ham.cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    ph.unpersist()

    assert(banded == quadratic)
  }

  test("an exact duplicate payload surfaces as a hamming-0 pair") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(40)
    val dup = base.filter(col("doc_id") === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val media = Media.synthesizeCovering(base.unionByName(dup), "doc_id", "text")
      .as[Media.MediaRow]
    val pairs = MinHashLSH.hammingBandPairs(
        Media.dHash(media).toDF(), "media_id", "ph_hi", "ph_lo", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 100000L && h == 0L })
  }
}
