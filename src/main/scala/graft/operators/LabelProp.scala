package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a directed edge list — the
  * workhorse of large-scale entity/community assignment (propagate known
  * labels to unlabeled nodes through the graph).
  *
  * Semantics per round, with CLAMPED seeds (the standard semi-supervised
  * form): a seeded node keeps its seed forever; an unseeded node takes
  * the MAJORITY label among its in-neighbors' current labels, ties
  * broken toward the smallest label; nodes with no labeled in-neighbor
  * stay unlabeled (null).
  *
  * Inputs: `nodes(node, seed)` (seed nullable long), `edges(src, dst)`
  * (directed; symmetrize first for undirected semantics). Output:
  * `(node, label)` after `iters` rounds.
  *
  * Scale: each round is one edges⋈labels hash equi-join on src (labels =
  * node-count rows — the broadcast side while nodes ≪ edges), one
  * (dst, label) hash aggregate with map-side partials, and one max_by
  * aggregate per dst — the vote never materializes more than one row per
  * (node, incident label). Lineage is cut per round so iteration depth
  * stays O(1) in plan size (reliable checkpoint on a real cluster).
  */
object LabelProp {

  def step(nodes: DataFrame, edges: DataFrame, labels: DataFrame): DataFrame = {
    val votes = edges
      .join(labels.withColumnRenamed("node", "src"), "src")
      .filter(col("label").isNotNull)
      .groupBy(col("dst"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(max_by(col("label"), struct(col("c"), -col("label"))).as("vote"))
    nodes
      .join(votes.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("seed"), col("vote")).as("label"))
  }

  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    var labels = nodes.select(col("node"), col("seed").as("label"))
    for (_ <- 1 to iters)
      labels = step(nodes, edges, labels).localCheckpoint(true)
    labels
  }
}
