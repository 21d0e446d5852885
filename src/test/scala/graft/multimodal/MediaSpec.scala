package graft.multimodal

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("binary-column pipeline: synthesize → mapPartitions features") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Media.synthesize(docs, "doc_id", "text").as[Media.MediaRow]
    val feats = Media.extractFeatures(media, framesPerItem = 4).cache()

    assert(feats.count() == 50)
    val f = feats.filter(_.media_id == 0L).head()
    assert(f.kind == "image")
    assert(f.n_bytes > 0)
    assert(f.histogram.length == 16)
    assert(f.histogram.sum == f.n_bytes) // every byte lands in one bin
    assert(f.frames_sampled > 0)
  }

  test("feature extraction is deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val media = Media.synthesize(docs, "doc_id", "text").as[Media.MediaRow]
    val a = Media.extractFeatures(media).collect().map(f => (f.media_id, f.checksum)).sorted
    val b = Media.extractFeatures(media).collect().map(f => (f.media_id, f.checksum)).sorted
    assert(a.sameElements(b))
  }

  test("frame sampling bounds: short payloads yield no frames") {
    assert(Media.sampleFrames(Array[Byte](1, 2, 3), 4).isEmpty)
    val frames = Media.sampleFrames(Array.fill[Byte](100)(7), 4)
    assert(frames.nonEmpty && frames.forall(_.length == 16))
  }

  test("frame offsets: ascending, deduplicated, in-bounds") {
    assert(Media.frameOffsets(15, 4).isEmpty)           // too short
    assert(Media.frameOffsets(16, 4) == Seq(0))         // all windows collapse
    assert(Media.frameOffsets(100, 1) == Seq(0))        // single frame at start
    val offs = Media.frameOffsets(1000, 4)
    assert(offs == offs.sorted && offs.distinct == offs)
    assert(offs.forall(o => o >= 0 && o + 16 <= 1000))
    assert(offs.size == 4)
  }

  test("frameRows explodes exactly the offset-formula rows") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val media = Media.synthesize(docs, "doc_id", "text").as[Media.MediaRow]
    val rows = Media.frameRows(media, framesPerItem = 4).collect()
    val byId = rows.groupBy(_.media_id)
    media.collect().foreach { m =>
      val expect = Media.frameOffsets(m.bytes.length, 4)
      val got = byId.getOrElse(m.media_id, Array.empty).sortBy(_.frame_idx)
      assert(got.map(_.byte_offset).toSeq == expect.map(_.toLong))
      assert(got.forall(_.frame.length == 16))
    }
  }

  test("resize: nearest-neighbor kernel against a hand-computed 4x2 -> 2x2 case") {
    // image 4 wide × 2 high, pixels 10..17 row-major:
    //   10 11 12 13
    //   14 15 16 17
    // 2×2 thumb: sy = y*2/2 = y, sx = x*4/2 = 2x → picks (0,0)(0,2)(1,0)(1,2)
    val bytes = Array[Byte](10, 11, 12, 13, 14, 15, 16, 17)
    val media = Seq(Media.MediaRow(7L, "image", bytes, 4, 2, 0)).toDS()
    val r = Media.resize(media, tw = 2, th = 2).head()
    assert(r.thumb.toSeq == Seq[Byte](10, 12, 14, 16))
    assert(r.px_sum == 10 + 12 + 14 + 16)
    val expCk = Seq(10, 12, 14, 16).foldLeft(0L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(r.px_checksum == expCk)
    assert((r.out_w, r.out_h) == (2, 2))
  }

  test("resize reads 0 past a truncated payload and never shuffles bytes") {
    // metadata claims 4×4 but only 5 bytes exist → indices ≥ 5 read 0
    val media = Seq(Media.MediaRow(1L, "image",
      Array[Byte](1, 2, 3, 4, 5), 4, 4, 0)).toDS()
    val r = Media.resize(media, tw = 4, th = 4).head()
    assert(r.thumb.toSeq.take(5) == Seq[Byte](1, 2, 3, 4, 5))
    assert(r.thumb.toSeq.drop(5).forall(_ == 0))
    assert(r.px_sum == 1 + 2 + 3 + 4 + 5)
  }

  test("resize degrades corrupt metadata to 0-pixels instead of throwing") {
    // negative dims and an Int-overflowing width×height product must both
    // land in the out-of-range branch, not AIOOBE the executor
    val media = Seq(
      Media.MediaRow(1L, "image", Array[Byte](9, 9), -4, 4, 0),
      Media.MediaRow(2L, "image", Array[Byte](9, 9), 100000, 50000, 0)).toDS()
    val rs = Media.resize(media, tw = 8, th = 8).collect().sortBy(_.media_id)
    assert(rs.forall(_.thumb.length == 64))
    // every pixel is either an in-range payload byte (9) or the 0 pad —
    // never garbage from a wrapped negative index
    assert(rs.forall(_.thumb.forall(b => b == 9 || b == 0)))
  }
}
