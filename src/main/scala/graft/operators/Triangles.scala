package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph.
  *
  * Input: an edge list with long columns `a`, `b` (one row per undirected
  * edge, any orientation, self-loops and duplicates tolerated — they are
  * canonicalized away). Output: a single row
  * `(n_nodes, n_edges, n_wedges, n_triangles)` where `n_wedges` is the
  * open-wedge count Σ C(deg(v), 2) — the denominator of the global
  * clustering coefficient.
  *
  * Scale design — the classic degree-ordered orientation (Schank &
  * Wagner): orient every edge from its lower-(degree, id) endpoint to the
  * higher one. The orientation is acyclic (it follows a total order), so
  * each triangle is counted exactly once, and the wedge join enumerates
  * only pairs of OUT-edges of the ordered DAG, bounding the intermediate
  * at Σ outdeg(v)² where outdeg ≤ O(√m) for any graph — this is what
  * keeps the plan alive on power-law graphs where a naive id-ordered
  * orientation leaves a celebrity node with 10⁸ out-edges. Both joins are
  * hash equi-joins on node ids (shuffle by key, AQE-skew-splittable);
  * nothing is ever collected to the driver.
  */
object Triangles {

  def count(edges: DataFrame): DataFrame = {
    // canonicalize: undirected simple graph, a < b
    val e = edges
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))

    // orient low-(deg, id) → high-(deg, id)
    val withDeg = e
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))

    // wedge u→v, v→w closed by oriented edge u→w
    val o1 = oriented.select(col("src").as("u"), col("dst").as("v"))
    val o2 = oriented.select(col("src").as("v"), col("dst").as("w"))
    val wedges = o1.join(o2, "v").select(col("u"), col("w"))
    val tri = wedges.join(
      oriented.withColumnRenamed("src", "u").withColumnRenamed("dst", "w"),
      Seq("u", "w"))

    val triCount = tri.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    val edgeStats = e.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
    val nodeStats = deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1L) div 2")).as("n_wedges"))

    nodeStats.crossJoin(edgeStats).crossJoin(triCount)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }
}
