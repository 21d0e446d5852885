package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order interleave correctness and the locality property the layout
  * exists for: files from a z-sorted write bound BOTH dimensions. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("column expression matches the reference interleave bit-for-bit") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .withColumn("z", ZOrder.interleave($"x", $"y", 4))
      .select($"x", $"y", $"z").as[(Long, Long, Long)]
      .collect().toSeq
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.interleaveRef(x, y, 4), s"($x,$y)")
    }
  }

  test("known values: interleave is the textbook Morton code") {
    // z(3, 5) with 3 bits: x=011 even bits, y=101 odd bits -> 100111 = 39
    assert(ZOrder.interleaveRef(3, 5, 3) == 39L)
    assert(ZOrder.interleaveRef(0, 0, 8) == 0L)
    assert(ZOrder.interleaveRef(255, 0, 8) == 0x5555L)
    assert(ZOrder.interleaveRef(0, 255, 8) == 0xAAAAL)
  }

  test("interleaveN matches its reference, degenerates to the 2-way " +
    "form, and bounds EVERY dimension in a 3-way layout") {
    // bit-for-bit vs the reference, and n=2 == the historical layout
    val rows3 = for (x <- 0L until 8L; y <- 0L until 8L; w <- 0L until 8L)
      yield (x, y, w)
    val got = rows3.toDF("x", "y", "w")
      .withColumn("z", ZOrder.interleaveN(Seq($"x", $"y", $"w"), 3))
      .withColumn("z2", ZOrder.interleaveN(Seq($"x", $"y"), 3))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, w, z, z2) =>
      assert(z == ZOrder.interleaveNRef(Seq(x, y, w), 3), s"($x,$y,$w)")
      assert(z2 == ZOrder.interleaveRef(x, y, 3), s"n=2 parity ($x,$y)")
    }
    // 3-way locality: 16x16x16 grid into 64 files — every file bounds
    // all THREE dimensions (span well under the domain)
    val rows16 = for (x <- 0L until 16L; y <- 0L until 16L;
      w <- 0L until 16L) yield (x, y, w)
    val maxSpan = rows16.toDF("x", "y", "w")
      .withColumn("f",
        (ZOrder.interleaveN(Seq($"x", $"y", $"w"), 4) / 64).cast("long"))
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("sx"),
        (max($"y") - min($"y")).as("sy"),
        (max($"w") - min($"w")).as("sw"))
      .select(max(greatest($"sx", $"sy", $"sw"))).as[Long].head()
    assert(maxSpan <= 7L, s"3-way z-file max dimension span $maxSpan")
  }

  test("z-sorted files bound both dimensions; a 1-D sort leaves y unbounded") {
    // 64x64 grid, 16 files: z-layout keeps each file in a quadrant-ish
    // region (span <= 16 per dim); sorting by x alone gives files whose
    // y-span is the full domain.
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y")
    val zSpans = df
      .withColumn("f", (ZOrder.interleave($"x", $"y", 6) / 256).cast("long"))
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .select(max(greatest($"sx", $"sy"))).as[Long].head()
    val xSpans = df
      .withColumn("f", ($"x" / 4).cast("long")) // 16 files by x ranges
      .groupBy($"f")
      .agg((max($"y") - min($"y")).as("sy"))
      .select(max($"sy")).as[Long].head()
    assert(zSpans <= 15L, s"z-file max dimension span $zSpans")
    assert(xSpans == 63L, "x-only sort should leave y spanning the domain")
  }
}
