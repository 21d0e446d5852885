package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a directed edge list — the
  * "within-k-hops" kernel (blast-radius queries, influence reach,
  * fraud-ring proximity). Each node's distance is the minimum number of
  * hops from ANY seed; nodes never reached stay null.
  *
  * Semantics per round: dist_i(n) = min(dist_{i-1}(n),
  * 1 + min over in-neighbors dist_{i-1}(nbr)) — monotone, so `maxHops`
  * rounds compute exact distances up to `maxHops` and leave farther
  * nodes null (a valid truncated answer, unlike label propagation where
  * truncation can leave WRONG labels).
  *
  * Scale shape (the LabelProp/PageRank iteration discipline): per round
  * ONE edges⋈dist hash equi-join on src (the dist side is node-count
  * rows — broadcast while nodes ≪ edges) + one map-side-combinable min
  * aggregate on dst + one left join back. Lineage is cut per round with
  * an eager localCheckpoint so plan depth stays O(1); swap for a
  * reliable checkpoint dir on a long-lived cluster (see Components for
  * the fault-tolerance caveat).
  */
object Bfs {

  /** One relaxation round. `dist` is (node, dist nullable); `edges` is
    * (src, dst), directed — symmetrize first for undirected reach. */
  def step(dist: DataFrame, edges: DataFrame): DataFrame = {
    val reach = edges
      .join(dist.select(col("node").as("src"), col("dist").as("__dn")), "src")
      .filter(col("__dn").isNotNull)
      .groupBy(col("dst"))
      .agg((min(col("__dn")) + lit(1L)).as("__via"))
    dist
      .join(reach.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"),
        when(col("dist").isNull, col("__via"))
          .when(col("__via").isNull, col("dist"))
          .otherwise(least(col("dist"), col("__via"))).as("dist"))
  }

  /** @param nodes (node, dist) with dist = 0 for seeds, null otherwise */
  def run(nodes: DataFrame, edges: DataFrame, maxHops: Int): DataFrame = {
    var dist = nodes.select(col("node"), col("dist").cast("long").as("dist"))
    for (_ <- 1 to maxHops)
      dist = step(dist, edges).localCheckpoint(true)
    dist
  }
}
