package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * - [[bruteTopK]]: exact cosine top-k of a (small, broadcast) query set
  *   against the full corpus — the correctness baseline. One narrow pass
  *   over the corpus per run; queries are broadcast so the corpus never
  *   shuffles; top-k via per-query window on a corpus-partitioned frame.
  *
  * - [[nnWithinBucket]]: the IVF-style scale path — neighbors are only
  *   sought inside a coarse bucket (here any precomputed bucket column:
  *   a cluster id, an LSH sign-bucket, a label). Turns N² into
  *   Σ bucket² and keeps the join an equi-join on the bucket key, which
  *   Spark shuffles hash-partitioned — linear scale-out.
  *
  * Cosine is computed in double precision with a strictly sequential fold
  * (`aggregate`), making results bit-identical to the DuckDB oracle's
  * `list_reduce` — similarity output is floor(sim·1e6) for exact compare.
  *
  * Zero-magnitude vectors yield NaN cosine, which BOTH engines rank above
  * every real similarity (Spark and DuckDB agree, so oracle parity holds)
  * — but semantically a zero vector would then "win" every bucket it is
  * in. Callers should filter zero-norm vectors before NN search.
  */
object Knn {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic, oracle-portable. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Interpreted-HOF cosine — kept as the spec oracle for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Hot-path cosine: fused native codegen expression, bit-identical to
    * [[cosineHof]] (same sequential fold order; see CosineSimExpr). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr(a, b)

  /** Exact top-k neighbors for each row of `queries` (small, broadcast). */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("__sim", cosine(col("__qv"), col("__v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("__sim") * 1e6).cast("long").as("sim_ppm"),
        col("__rn").cast("int").as("rank"))
  }

  /** Random-hyperplane LSH bucketing: `planes` sign bits of dot products
    * with deterministic pseudo-random hyperplanes (seeded arithmetic, no
    * RNG state — replayable across runs and engines). Vectors whose sign
    * patterns match land in the same bucket; cosine-similar vectors
    * collide with high probability. Combine with [[nnWithinBucket]] for
    * the ANN scale path: N² search becomes Σ bucket².
    *
    * Plane p, dim i weight: frac((p·1315423911 + i·2654435761) mod 1000003
    * / 1000003) − 0.5. */
  def signBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotp = (0 until dim).map { i =>
        val w = (((p.toLong * 1315423911L + i.toLong * 2654435761L) % 1000003L)
          .toDouble / 1000003.0) - 0.5
        element_at(vec, i + 1).cast("double") * lit(w)
      }.reduce(_ + _)
      when(dotp >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Top-1 neighbor per row, searched only within `bucketCol` (IVF path). */
  def nnWithinBucket(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String): DataFrame = {
    val t = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      col(bucketCol).as("__bk"))
    val pairs = t.as("a").join(t.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("vec_id"), col("a.__bk").as("bucket"),
        col("b.__id").as("__nid"),
        cosine(col("a.__v"), col("b.__v")).as("__sim"))
    // top-1 by (sim desc, neighbor id asc) as a single-pass hash aggregate
    pairs
      .groupBy(col("vec_id"), col("bucket"))
      .agg(max_by(struct(col("__nid"), floor(col("__sim") * 1e6).cast("long").as("__sp")),
        struct(col("__sim"), negate(col("__nid")))).as("__r"))
      .select(col("vec_id"), col("bucket"),
        col("__r.__nid").as("nn_id"), col("__r.__sp").as("nn_sim_ppm"))
  }
}
