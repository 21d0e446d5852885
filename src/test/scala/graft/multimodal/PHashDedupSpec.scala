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

  // ---- real-codec path: encoded PNGs through javax.imageio ------------

  private def pngBytes(px: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeRaster: real PNG decodes to its own dims and luma bytes") {
    val bytes = pngBytes((x, y) => x * 3 + y, w = 16, h = 8)
    val r = Media.decodeRaster(bytes).get
    assert(r.w == 16 && r.h == 8)
    // gray pixel (x,y) = the luma of the RGB we wrote = the gray value
    assert((r.gray(0) & 0xff) == 0)
    assert((r.gray(3) & 0xff) == 9) // x=3,y=0
    assert((r.gray(2 * 16 + 1) & 0xff) == 5) // x=1,y=2
    // a text payload is never misread as an image
    assert(Media.decodeRaster("BMnot really a bitmap".getBytes("UTF-8")).isEmpty)
    // a corrupt payload with a real PNG signature degrades to None
    assert(Media.decodeRaster(bytes.take(20)).isEmpty)
  }

  test("real PNG pair: re-encoded brightness shift is a near-dup, a different image is not") {
    import spark.implicits._
    // horizontal gradient picture; sibling = same picture +6 brightness
    // (dHash is a gradient-SIGN map, so a uniform shift preserves it);
    // stranger = the gradient flipped (every sign inverts)
    val base = pngBytes((x, y) => 16 + x * 3)
    val shifted = pngBytes((x, y) => 22 + x * 3)
    val flipped = pngBytes((x, y) => 16 + (63 - x) * 3)
    val media = Seq(
      Media.MediaRow(1L, "image", base, 0, 0, 0),
      Media.MediaRow(2L, "image", shifted, 0, 0, 0),
      Media.MediaRow(3L, "image", flipped, 0, 0, 0)).toDS()
    // width/height metadata is 0 — the REAL dims must come from the codec
    val hashes = Media.dHash(media).collect().map(r => r.media_id -> (r.ph_hi, r.ph_lo)).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(hashes(1L), hashes(2L)) == 0) // brightness-invariant
    assert(ham(hashes(1L), hashes(3L)) > 40) // structure flip ⇒ far

    // and the banded join surfaces exactly the near pair
    val pairs = MinHashLSH.hammingBandPairs(
        Media.dHash(media).toDF(), "media_id", "ph_hi", "ph_lo", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
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
