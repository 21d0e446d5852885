package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign random projection: embed `dim`-dimensional
  * vectors into `outDims` dimensions as `p_j = Σ_i s(i,j)·q_i` with a
  * deterministic ±1 sign matrix, preserving pairwise distances within
  * (1±ε) — the cheap front-end that lets downstream ANN / clustering /
  * near-dup run on 8 numbers instead of 64 floats.
  *
  * Engine-portability: inputs are micro-quantized to longs
  * (`floor(v·1e6)`) first, so every projected coordinate is an exact
  * integer sum — no float fold-order dependence — and the sign matrix is
  * pure integer hashing (`((i·outDims+j)·2654435761) mod 2^20`, bit 19),
  * reproducible by any engine from the formula alone (no shipped
  * weights). Scale: a narrow per-row map, no shuffle; the projected
  * table is ~dim/outDims× smaller than the source vectors.
  */
object RandomProjection {

  /** Deterministic ±1 sign for input dim `i`, output dim `j`. */
  private[graft] def sign(i: Int, j: Int, outDims: Int): Long =
    if (((i.toLong * outDims + j) * 2654435761L) % 1048576L >= 524288L) -1L
    else 1L

  /** Quantize a float-array column to micro-unit longs. */
  def quantize(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * 1e6).cast("long"))

  /** Append projected columns `p0..p<outDims-1>` (exact longs) computed
    * from the float-array `vecCol` of width `dim`. */
  def project(df: DataFrame, vecCol: String, dim: Int, outDims: Int): DataFrame = {
    val qv = quantize(col(vecCol))
    val projected = (0 until outDims).foldLeft(df.withColumn("__qv", qv)) {
      (acc, j) =>
        val signs = (0 until dim).map(i => sign(i, j, outDims))
        acc.withColumn(s"p$j",
          aggregate(
            zip_with(col("__qv"), typedLit(signs), (a, b) => a * b),
            lit(0L), (s, x) => s + x))
    }
    projected.drop("__qv")
  }
}
