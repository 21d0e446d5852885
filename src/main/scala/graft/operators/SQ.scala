package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (the faiss `ScalarQuantizer QT_8bit` shape):
  * per-dimension [min, max] fit → one uint8 code per dimension →
  * integer symmetric distance. Completes the quantizer family next to
  * the 1-bit sign code ([[BinaryQuant]], 64× compression, coarsest) and
  * the subspace codebooks ([[PQ]], 64× with learned centroids): SQ8 is
  * the 4×-compression / high-fidelity point — 1 B/dim, distances exact
  * BIGINT sums of (qa−qb)², no float anywhere in the search loop, so
  * results are engine-portable by construction (the property the DuckDB
  * oracle checks end to end, fit included).
  *
  * Scale shape: the fit is one 64-group min/max aggregate (map-side
  * combinable, one metadata-sized row out); encoding is a narrow
  * broadcast-join pass; search scans codes only. Codes are comparable
  * only under ONE fit — persist it with any index, the
  * [[VectorIndex]] never-refit contract.
  */
object SQ {

  /** One row, `__mn`/`__mx` array<double> columns: per-dim min/max — the
    * SQ8 training artifact. Min/max are order-independent exact
    * aggregates, so the fit carries no float-order dependence. */
  def fitMinMax(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(
        struct(col("pos"), col("mn"), col("mx")))).as("__ps"))
      .select(transform(col("__ps"), x => x.getField("mn")).as("__mn"),
        transform(col("__ps"), x => x.getField("mx")).as("__mx"))

  /** `vecCol` + broadcast fit → array<int> of uint8 codes:
    * code[i] = clamp(⌊(v − mn)·255/(mx − mn)⌋, 0, 255); a degenerate
    * dimension (mx = mn) codes to 0. Every op is a single
    * correctly-rounded IEEE step in a fixed association, so codes are
    * bit-identical across engines. */
  def withCodes(emb: DataFrame, vecCol: String, fit: DataFrame,
      codeCol: String = "qcode"): DataFrame =
    emb.crossJoin(broadcast(fit))
      .withColumn(codeCol, expr(
        s"""transform($vecCol, (v, i) ->
           |  IF(element_at(__mx, i + 1) = element_at(__mn, i + 1), 0,
           |    CAST(least(255.0D, greatest(0.0D,
           |      floor((CAST(v AS DOUBLE) - element_at(__mn, i + 1)) * 255.0D
           |        / (element_at(__mx, i + 1) - element_at(__mn, i + 1)))))
           |      AS INT)))""".stripMargin))
      .drop("__mn", "__mx")

  /** Exact symmetric SQ distance: Σ (qa−qb)² as BIGINT. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => ((x - y) * (x - y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Top-k per query by (distance, neighbor id) over the coded corpus —
    * the declarative oracle-parity form; the one-pass bounded-heap shape
    * ([[BinaryQuant.coarseHammingTopR]], [[Knn]]'s partitioned brute) is
    * the established scale path for corpus-sized query fan-outs. */
  def searchTopK(coded: DataFrame, idCol: String, codeCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(codeCol).as("__qc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sqdist"), col("neighbor_id"))
    coded.select(col(idCol).as("neighbor_id"), col(codeCol).as("__nc"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sqdist", sqDist(col("__qc"), col("__nc")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sqdist"), col("rank"))
  }
}
