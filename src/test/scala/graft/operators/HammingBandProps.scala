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

  property("tiled skew guard (maxBucket) ≡ untiled pair set, symmetric + asymmetric") =
    Prop.forAll(genRows, genCfg, Gen.chooseNum(1, 6)) {
      case (rows, (bandBits, tau), maxBucket) =>
        import spark.implicits._
        val df = rows.zipWithIndex
          .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
          .toDF("id", "hi", "lo")
        def pairs(mb: Int) = MinHashLSH.hammingBandPairs(df, "id", "hi", "lo",
            maxHamming = tau, bandBits = bandBits, maxBucket = mb)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        def joined(mb: Int) = MinHashLSH.hammingBandJoin(df, df, "id", "hi",
            "lo", maxHamming = tau, bandBits = bandBits, maxBucket = mb)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        def sim(mb: Int) = MinHashLSH.simhashBandPairs(
            df.selectExpr("id", "hi & 1073741823 AS sh"), "id", "sh",
            maxHamming = tau, bits = 30,
            bandBits = if (bandBits == 16) 0 else bandBits, maxBucket = mb)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // tiny maxBucket forces tiling on ~every bucket — the guard must
        // be a pure parallelization, never a result change
        Prop(pairs(maxBucket) == pairs(Int.MaxValue) &&
          joined(maxBucket) == joined(Int.MaxValue) &&
          sim(maxBucket) == sim(Int.MaxValue)) :|
          s"tau=$tau bb=$bandBits mb=$maxBucket"
    }

  property("degenerate bucket flood: identical hashes complete tiled, exact count") = {
    // the blank-media scenario: a flood of IDENTICAL hashes makes one
    // (band, key) bucket quadratic — with the guard the C(n,2) true
    // pairs still all emerge (count-verified against the closed form)
    // while the work spreads over ⌈n/maxBucket⌉ tiles per band instead
    // of serializing on one task
    import spark.implicits._
    val n = 3000
    val flood = (0 until n).map(i => (i.toLong, 0xABCD1234L, 0x00FF00FFL))
    val strays = (0 until 50).map(i =>
      (100000L + i, (0x10000000L + i * 1315423911L) & 0xFFFFFFFFL,
        (i * 2654435761L) & 0xFFFFFFFFL))
    val df = (flood ++ strays).toDF("id", "hi", "lo")
    val got = MinHashLSH.hammingBandPairs(df, "id", "hi", "lo",
      maxHamming = 0, bandBits = 16, maxBucket = 256)
    val floodPairs = got.filter("id_a < 100000 AND id_b < 100000").count()
    Prop(floodPairs == n.toLong * (n - 1) / 2) :| s"floodPairs=$floodPairs"
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
