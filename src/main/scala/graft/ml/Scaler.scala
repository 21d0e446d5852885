package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Standard scaling `(x - mean) / std` with sklearn-parity semantics
  * (reference scalers, database_and_model_tools.py:211-230):
  *
  *  - population std (ddof=0) — `stddev_pop`, NOT Spark's default
  *    `stddev_samp` (SURVEY.md §2.9 M2);
  *  - zero-variance columns scale by 1.0, not 1/0 (the reference data's
  *    constant `month` column).
  *
  * Fit is one distributed aggregate; transform is a narrow column
  * expression — nothing is collected except the tiny stats row.
  */
object Scaler {

  final case class ColStats(mean: Double, scale: Double)

  /** One-pass fit: per-column mean + population std (zero → 1.0). */
  def fit(df: DataFrame, cols: Seq[String]): Map[String, ColStats] = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"${c}__mean"),
      stddev_pop(col(c)).as(s"${c}__std")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val m = Option(row.getAs[Any](s"${c}__mean"))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val s = Option(row.getAs[Any](s"${c}__std"))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      c -> ColStats(m, if (s == 0.0 || s.isNaN) 1.0 else s)
    }.toMap
  }

  /** Apply `(x - mean) / scale` producing `<col>_scaled` columns. */
  def transform(df: DataFrame, stats: Map[String, ColStats]): DataFrame =
    stats.foldLeft(df) { case (d, (c, st)) =>
      d.withColumn(s"${c}_scaled", (col(c) - st.mean) / st.scale)
    }

  /** Scale a single in-memory vector (the reference's ScalerTester path,
    * database_and_model_tools.py:220-228). */
  def transformVector(xs: Seq[Double], stats: Seq[ColStats]): Seq[Double] =
    xs.zip(stats).map { case (x, st) => (x - st.mean) / st.scale }
}
