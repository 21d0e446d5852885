package graft.queries

import graft.{Q, Tables}
import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Graph analytics over relationship graphs derived from the warehouse.
  * Connected components (dedup clustering) lives in DedupQueries; here:
  * PageRank centrality over the customer-nation → supplier-nation trade
  * graph.
  */
object GraphQueries {

  /** Unrolled-CTE DuckDB mirror of PageRank.run: same integer-ppm
    * arithmetic, one CTE per iteration (the k-means oracle pattern). */
  private def pagerankOracle(iters: Int, dampPct: Int): String = {
    val basePpm = (100 - dampPct) * 10000L
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node, $basePpm + $dampPct * coalesce(c.cs, 0) // 100 AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst, CAST(sum(p.r * e.w // e.out_w) AS BIGINT) AS cs
         |    FROM e JOIN r${i - 1} p ON e.src = p.node
         |    GROUP BY e.dst) c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey  = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
       |  GROUP BY 1, 2),
       |e AS (
       |  SELECT e0.src, e0.dst, e0.w, ow.out_w
       |  FROM e0 JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS out_w
       |                FROM e0 GROUP BY src) ow USING (src)),
       |n AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
       |$rounds
       |SELECT node, r AS rank_ppm FROM r$iters ORDER BY node""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // ---- PageRank centrality over the trade graph --------------------------
    // Which supplier nations the order flow concentrates on: edges are
    // (customer nation → supplier nation) weighted by lineitem count,
    // then 3 damped PageRank rounds in exact integer ppm (see
    // operators.PageRank). Scale: the fact tables aggregate down to the
    // weighted edge list in one shuffle (map-side partials); each
    // iteration is one edges⋈ranks equi-join (ranks = node-count rows —
    // broadcast side) + one hash aggregate on dst. The oracle unrolls
    // the same three rounds as CTEs, so the damping, integer division,
    // and dangling-mass semantics are all hash-checked.
    Q("q_pagerank",
      (s, dir) => {
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)
              .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").cast("long").as("src"),
            col("s_nationkey").cast("long").as("dst"))
          .agg(count(lit(1)).as("w"))
        val nodes = Tables.nation(s, dir)
          .select(col("n_nationkey").cast("long").as("node"))
        PageRank.run(nodes, edges, iters = 3, dampPct = 85)
          .orderBy(col("node"))
      },
      Some(pagerankOracle(iters = 3, dampPct = 85)))
  )
}
