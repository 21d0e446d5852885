package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group as a single hash aggregate with a bounded buffer.
  *
  * The window formulation (`row_number` over partitionBy + filter ≤ k)
  * shuffles and SORTS every input row. This aggregator keeps at most ~2k
  * candidates per group inside the partial (map-side) aggregate, so the
  * shuffle carries ≤ 2k rows per (group × input partition) and nothing is
  * globally sorted — the right shape when groups are large (top-5 events
  * out of millions per user at 100 TB).
  *
  * Determinism: ordered by (value desc, id asc) — ties broken by id, so
  * results hash-match the oracle's ROW_NUMBER with the same ORDER BY.
  */
object TopK {

  /** Aggregator buffer: unordered candidate list, trimmed whenever it
    * exceeds 2k; finish() sorts and takes the final k. */
  class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

    // Matches Spark SQL `value DESC, id ASC`: java.lang.Double.compare
    // ranks NaN above +Inf, like Spark's descending sort. (Scala's
    // Ordering.by(-value) would rank NaN LAST — a silent divergence from
    // the ROW_NUMBER oracle.)
    private def ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val byValueDesc = java.lang.Double.compare(b._1, a._1)
        if (byValueDesc != 0) byValueDesc else java.lang.Long.compare(a._2, b._2)
      }
    }

    private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (b.length <= 2 * k) b else b.sorted(ord).take(k)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)

    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(b1 ++ b2)

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      bufferEncoder
  }

  /** Top-k (value, id) per key group, exploded to one row per rank.
    * Output: keyCols..., rank (1-based), value, id. Rows with a null
    * value or id are excluded (the primitive tuple encoder cannot carry
    * nulls; for DESC ranking this matches NULLS-LAST up to k non-null
    * rows per group). */
  def perGroup(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double"), col(idCol).cast("long")).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__t")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__t._1").as("value"),
        col("__t._2").as("id")): _*)
  }
}
