package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check for the two-half banded Hamming join: on ARBITRARY
  * 64-bit hashes (not just corpus-derived ones) and any legal
  * (maxHamming, bandBits), the banded output equals a from-scratch JVM
  * popcount model — the pigeonhole recall-1.0 claim, exercised across the
  * whole hash space including adversarial all-zero / all-one values. */
object HammingBandProps extends Properties("graft.hammingband") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val genHalf: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, (1L << 32) - 1),
    Gen.oneOf(0L, (1L << 32) - 1, 0x55555555L, 0xAAAAAAAAL))
  private val genRows: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 14).flatMap(n => Gen.listOfN(n, Gen.zip(genHalf, genHalf)))
  // bandBits = 0 exercises the derived-width default (bandBitsFor from
  // count(*)); tau past the band count exercises the sub-radius
  // multi-index probe path (s = ⌊tau/bands⌋ ≥ 1), capped per width so the
  // flip-mask enumeration stays small in a property run
  private val genCfg: Gen[(Int, Int)] = for {
    bandBits <- Gen.oneOf(0, 4, 8, 16)
    tau <- Gen.chooseNum(0, bandBits match {
      case 16 => 11 // s ≤ 2 → ΣC(16,≤2) = 137 probe masks
      case _ => 24 // 4-bit: s ≤ 1; 8-bit: s ≤ 3 (93 masks); derived: any
    })
  } yield (bandBits, tau)

  property("banded pairs ≡ JVM popcount model for any hashes and config") =
    Prop.forAll(genRows, genCfg) { case (rows, (bandBits, tau)) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
        .toDF("id", "hi", "lo")
      val got = MinHashLSH.hammingBandPairs(df, "id", "hi", "lo",
          maxHamming = tau, bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val idx = rows.zipWithIndex
      val expected = (for {
        ((ha, la), a) <- idx
        ((hb, lb), b) <- idx if a < b
        ham = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
        if ham <= tau
      } yield (a.toLong, b.toLong, ham.toLong)).toSet

      Prop(got == expected) :| s"got=$got expected=$expected tau=$tau bb=$bandBits"
    }

  property("simhash banded pairs ≡ JVM popcount model (derived + sub-radius)") =
    Prop.forAll(
      Gen.chooseNum(2, 14).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0L, (1L << 30) - 1))),
      Gen.oneOf(0, 4, 6, 10), // 0 = derived width
      Gen.chooseNum(0, 12)) { (hashes, bandBits, tau) =>
      import spark.implicits._
      val df = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "sh")
      val got = MinHashLSH.simhashBandPairs(df, "id", "sh",
          maxHamming = tau, bits = 30, bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = (for {
        (ha, a) <- hashes.zipWithIndex
        (hb, b) <- hashes.zipWithIndex if a < b
        ham = java.lang.Long.bitCount(ha ^ hb)
        if ham <= tau
      } yield (a.toLong, b.toLong, ham.toLong)).toSet
      Prop(got == expected) :| s"got=$got expected=$expected tau=$tau bb=$bandBits"
    }

  property("asymmetric band join ≡ JVM popcount model (probe × reference)") =
    Prop.forAll(genRows, genRows, genCfg) { case (ps, rs, (bandBits, tau)) =>
      import spark.implicits._
      val probe = ps.zipWithIndex
        .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
        .toDF("id", "hi", "lo")
      val ref = rs.zipWithIndex
        .map { case ((hi, lo), i) => (1000L + i, hi, lo) }
        .toDF("id", "hi", "lo")
      val got = MinHashLSH.hammingBandJoin(probe, ref, "id", "hi", "lo",
          maxHamming = tau, bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val expected = (for {
        ((ha, la), a) <- ps.zipWithIndex
        ((hb, lb), b) <- rs.zipWithIndex
        ham = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
        if ham <= tau
      } yield (a.toLong, 1000L + b, ham.toLong)).toSet

      Prop(got == expected) :| s"got=$got expected=$expected tau=$tau bb=$bandBits"
    }
}
