package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Haitsma–Kalker audio fingerprint: the double-difference bit scheme's
  * defining invariance (uniform gain/offset cancels), its sensitivity to
  * actual content change, and the short-payload bound. */
class AudioFpSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session

  private def fpOf(bytes: Array[Byte]): (Long, Long) = {
    import spark.implicits._
    val row = Media.audioFingerprint(
      Seq(Media.MediaRow(1L, "audio", bytes, 0, 0, 16000)).toDS()).head()
    (row.fp_hi, row.fp_lo)
  }

  test("uniform offset cancels: the fingerprint is gain-invariant") {
    // a deterministic pseudo-signal, values kept ≤ 200 so +20 never clamps
    val base = Array.tabulate[Byte](300)(i => ((i * 37 + i * i % 89) % 200).toByte)
    val louder = base.map(b => (b + 20).toByte)
    assert(fpOf(base) == fpOf(louder),
      "E(t,f) shifts by a per-band constant under uniform offset, and the " +
        "time x band double difference must cancel it exactly")
  }

  test("content changes flip bits; exact copies collide at hamming 0") {
    val base = Array.tabulate[Byte](300)(i => ((i * 37 + i * i % 89) % 200).toByte)
    val other = Array.tabulate[Byte](300)(i => ((i * 53 + 7) % 200).toByte)
    val (h1, l1) = fpOf(base)
    val (h2, l2) = fpOf(other)
    val ham = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(ham > 10, s"different signals must land far apart, got $ham")
    assert(fpOf(base.clone()) == fpOf(base))
    // halves are portable: non-negative 32-bit values
    assert(h1 >= 0 && h1 < (1L << 32) && l1 >= 0 && l1 < (1L << 32))
  }

  test("payloads under one 32-byte window yield no fingerprint row") {
    import spark.implicits._
    val short = Seq(Media.MediaRow(1L, "audio", Array.fill[Byte](31)(5), 0, 0, 0)).toDS()
    assert(Media.audioFingerprint(short).count() == 0)
    val exact = Seq(Media.MediaRow(2L, "audio", Array.fill[Byte](32)(5), 0, 0, 0)).toDS()
    assert(Media.audioFingerprint(exact).count() == 1)
  }
}
