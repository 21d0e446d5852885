package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the union-find
  * step of a dedup pipeline: near-dup PAIRS are only locally transitive
  * (a~b, b~c but a≁c), so canonical-document selection needs the
  * transitive closure, with each document labeled by its component's
  * minimum id.
  *
  * Algorithm: min-label propagation. Each node starts as its own label;
  * every round each node takes the min of its own and its neighbors'
  * labels; fixpoint in O(component diameter) rounds (near-dup clusters
  * are shallow — star-shaped around a template — so typically 2-4).
  *
  * Scale shape: one shuffle per round (join on the edge key + min
  * aggregate), all map-side-combinable; the driver holds only the
  * changed-count. Lineage/caches are cut per round with an eager
  * localCheckpoint (ContextCleaner GCs the blocks), so rounds don't
  * accumulate plan depth. For adversarial deep chains at planetary scale
  * the standard upgrade is large-star/small-star (O(log n) rounds); the
  * per-round plan is identical.
  *
  * Fault-tolerance caveat: localCheckpoint blocks live on executors only
  * (replicated ×2, but NOT on reliable storage) — on a real cluster,
  * losing enough executors mid-computation makes the truncated lineage
  * unrecoverable and fails the job, which then restarts from the source.
  * Long-running cluster deployments should set a reliable
  * `sparkContext.setCheckpointDir` and swap `localCheckpoint(true)` for
  * `checkpoint()` (or materialize rounds to a temp table); the algorithm
  * is unchanged.
  *
  * Non-convergence (component diameter > maxIter, only plausible for
  * pathological chain graphs — raise maxIter toward O(log n)·safety or
  * switch to large-star/small-star) fails loudly by default; pass
  * `failOnNonConvergence = false` to get the best-effort labeling
  * instead, which is a valid UPPER-bound clustering (labels may not have
  * fully propagated to the component minimum yet).
  */
object Components {

  /** @param edges two-column DataFrame of undirected edges
    * @return (id, cluster_id) for every node with at least one edge,
    *   cluster_id = min node id in the component */
  def connectedComponents(
      edges: DataFrame,
      idACol: String,
      idBCol: String,
      maxIter: Int = 20,
      failOnNonConvergence: Boolean = true): DataFrame = {
    val sym = edges
      .select(col(idACol).as("__src"), col(idBCol).as("__dst"))
      .union(edges.select(col(idBCol).as("__src"), col(idACol).as("__dst")))
      .distinct()
      .localCheckpoint(true)
    var comp = sym.select(col("__src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(comp.select(col("id").as("__dst"), col("cluster_id").as("__nc")),
          Seq("__dst"))
        .groupBy(col("__src"))
        .agg(min(col("__nc")).as("__nbrMin"))
      val next = comp
        .join(nbrMin.select(col("__src").as("id"), col("__nbrMin")), Seq("id"))
        .select(col("id"),
          least(col("cluster_id"), col("__nbrMin")).as("cluster_id"))
        .localCheckpoint(true)
      changed = next.as("n")
        .join(comp.as("c"), Seq("id"))
        .filter(col("n.cluster_id") =!= col("c.cluster_id"))
        .count()
      comp = next
      i += 1
    }
    require(!failOnNonConvergence || changed == 0,
      s"did not converge in $maxIter rounds")
    comp
  }
}
