package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over a weighted directed graph, in exact integer
  * arithmetic (parts-per-million ranks).
  *
  * Exactness: the usual double-precision formulation is fold-order-
  * sensitive, so a distributed sum is not reproducible across engines or
  * partitionings. Keeping ranks as BIGINT ppm and distributing each
  * node's rank along its out-edges with `rank * w div out_w` (truncating
  * integer division) makes every iteration pure BIGINT arithmetic — the
  * same result on any cluster size, and mirrorable in an unrolled SQL
  * CTE oracle. The truncation leaks ≤ out-degree µranks per node per
  * round (plus the mass of dangling nodes, which this variant drops, as
  * the original formulation does) — deterministic on both engines.
  *
  * Scale shape: this is the canonical vertex-centric form. Ranks and
  * edges are both DataFrames partitioned by node key; one iteration is
  * ONE equi-join (edges ⋈ ranks on src — ranks is the small side and
  * broadcasts whenever node count ≪ edge count, the usual web-graph
  * shape) plus ONE map-side-combinable hash aggregate on dst. Nothing is
  * ever quadratic and the edge table never changes partitioning across
  * iterations. Lineage is cut per round with an eager localCheckpoint —
  * same caveat as [[Components]]: executor-local blocks, so a real
  * cluster run with lost-executor tolerance swaps in reliable
  * checkpointing (`sparkContext.setCheckpointDir`).
  */
object PageRank {

  /** Run `iters` damped PageRank rounds.
    *
    * @param nodes (node: long) — the full vertex set (isolated vertices
    *              keep the base rank)
    * @param edges (src: long, dst: long, w: long) — positive weights
    * @param iters iteration count
    * @param dampPct damping factor as an integer percentage (85 = 0.85)
    * @return (node, rank_ppm) — ranks start at 1e6 per node; each round
    *         is base (1-d)·1e6 plus d·(weighted in-contributions)
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val basePpm = (100 - dampPct) * 10000L // (1-d) · 1e6

    // out_w is consumed every round: compute once, pre-partition by src,
    // and PERSIST (not checkpoint — a checkpointed LogicalRDD re-reads
    // slower and its first-touch cost dominated measured runs: 10M edges
    // × 3 rounds went 82 s → 17 s with persist; steady-state rounds are
    // ~1.5 s). The partitioning sticks to the cache, so no iteration
    // ever exchanges or sorts the edge table again — only the rank table
    // (node-count rows) moves per round. The cache's lifetime is bounded
    // to this call: every iteration ends in an EAGER checkpoint, so by
    // return time nothing references e and it unpersists safely.
    val e = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("__out_w")), Seq("src"))
      .repartition(col("src"))
      .persist()

    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_ppm"))
    for (_ <- 1 to iters)
      ranks = step(nodes, e, ranks, dampPct).localCheckpoint(true)
    e.unpersist()
    ranks
  }

  /** One damped round over a pre-weighted edge table `e`
    * (src, dst, w, __out_w). Exposed for plan-shape testing — `run`
    * checkpoints each round, which truncates the observable plan. */
  private[graft] def step(nodes: DataFrame, e: DataFrame, ranks: DataFrame,
                          dampPct: Int): DataFrame = {
    val basePpm = (100 - dampPct) * 10000L
    // shuffle_hash: build the hash map from the rank side — never sort
    // the (static, pre-partitioned) edge table; Spark still upgrades to
    // broadcast when ranks are small enough.
    val contrib = e.join(ranks.hint("shuffle_hash"), e("src") === ranks("node"))
      .select(col("dst"), expr("rank_ppm * w div __out_w").as("__c"))
      .groupBy(col("dst")).agg(sum(col("__c")).as("__cs"))
    nodes
      .join(contrib, nodes("node") === contrib("dst"), "left")
      .select(nodes("node"),
        (lit(basePpm) + expr(s"$dampPct * coalesce(__cs, 0L) div 100"))
          .as("rank_ppm"))
  }
}
