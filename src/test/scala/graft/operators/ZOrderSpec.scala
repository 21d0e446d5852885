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
