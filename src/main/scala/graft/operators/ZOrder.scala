package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-dimensional data skipping.
  *
  * A table range-partitioned/sorted on one column prunes scans on that
  * column only; sorting on `z = interleave(bits(x), bits(y))` keeps rows
  * that are close in BOTH dimensions in the same files, so per-file
  * min/max statistics bound both columns at once and a predicate on
  * either dimension (or both) skips most files. This is the layout trick
  * behind Delta/Iceberg `ZORDER BY` — here as a plain column expression
  * plus a sorted write, nothing engine-private.
  *
  * The interleave is pure integer shift/mask arithmetic
  * (`((x >> b) & 1) << 2b  |  ((y >> b) & 1) << 2b+1`), built as a
  * balanced tree of codegen'd bitwise ops — portable to any ANSI engine,
  * so layouts are oracle-checkable.
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns, `bits` bits each:
    * x occupies even result bits, y odd. Values must fit in `bits` bits
    * (mask them first); result fits in 2·bits bits. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `files` files clustered by the z-value of
    * (`xCol`, `yCol`) — repartitionByRange + sortWithinPartitions on z,
    * i.e. the physical layout a ZORDER BY write produces. */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      files: Int): DataFrame = {
    val z = interleave(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Morton-interleave N non-negative columns, `bits` bits each:
    * column i occupies result bits i, i+n, i+2n, … — the general form
    * behind `ZORDER BY (a, b, c, …)`. Values must fit in `bits` bits
    * (mask/bucketize first); the result fits in n·bits bits, which
    * must stay inside a non-negative BIGINT. For n = 2 the layout is
    * bit-identical to [[interleave]]. */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"interleaveN needs >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a non-negative BIGINT: $n * $bits > 63")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scala reference interleave for property tests. */
  private[graft] def interleaveRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  /** Scala reference N-way interleave for property tests. */
  private[graft] def interleaveNRef(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    (0 until bits).foldLeft(0L) { (acc, b) =>
      xs.zipWithIndex.foldLeft(acc) { case (a, (x, i)) =>
        a | (((x >> b) & 1L) << (b * n + i))
      }
    }
  }
}
