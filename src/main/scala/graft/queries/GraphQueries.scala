package graft.queries

import graft.{Q, Tables}
import graft.operators.{Bfs, LabelProp, PageRank, Triangles}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Undirected nation↔nation co-trade edges (a < b) kept when the pair
    * exchanges at least the MEAN per-pair lineitem count — a relative
    * threshold, so the subgraph stays meaningful at any scale factor. */
  private def coTradeEdges(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(
        least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
      .agg(count(lit(1)).as("w"))
    val stats = e0.agg(sum(col("w")).as("sw"), count(lit(1)).as("ne"))
    e0.crossJoin(broadcast(stats))
      .filter(col("w") * col("ne") >= col("sw"))
      .select(col("a"), col("b"))
  }

  /** DuckDB mirror of [[coTradeEdges]]: CTEs `e0`/`st`/`e` with `e(a, b)`
    * the filtered undirected edge set. MATERIALIZED because the callers
    * reference `e` from several CTEs — left to inline, DuckDB re-expands
    * the 4-way fact join per reference and (observed at sf0.1) plans
    * itself into tens of GB. */
  private val coTradeSql: String =
    """e0 AS MATERIALIZED (
      |  SELECT least(c.c_nationkey, s.s_nationkey)    AS a,
      |         greatest(c.c_nationkey, s.s_nationkey) AS b,
      |         count(*) AS w
      |  FROM lineitem l
      |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey  = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |  GROUP BY 1, 2),
      |st AS (SELECT CAST(sum(w) AS BIGINT) AS sw, count(*) AS ne FROM e0),
      |e AS MATERIALIZED (
      |      SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
      |      FROM e0, st WHERE w * ne >= sw)""".stripMargin

  /** Unrolled-CTE DuckDB mirror of LabelProp.run over the symmetrized
    * co-trade graph: per round, a (node, label) vote count from labeled
    * in-neighbors, arg-max with smallest-label ties, seeds clamped. */
  private def labelPropOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""v$i AS (
         |  SELECT ed.dst AS node, p.label AS lab, count(*) AS c
         |  FROM ed JOIN l${i - 1} p ON ed.src = p.node
         |  WHERE p.label IS NOT NULL GROUP BY 1, 2),
         |m$i AS (
         |  SELECT node, lab FROM v$i
         |  QUALIFY row_number() OVER (PARTITION BY node
         |                             ORDER BY c DESC, lab) = 1),
         |l$i AS (
         |  SELECT n.node, coalesce(n.seed, m$i.lab) AS label
         |  FROM n LEFT JOIN m$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH $coTradeSql,
       |ed AS (SELECT a AS src, b AS dst FROM e
       |       UNION ALL SELECT b, a FROM e),
       |n AS (SELECT CAST(n_nationkey AS BIGINT) AS node,
       |             CASE WHEN n_nationkey % 2 = 0
       |                  THEN CAST(n_regionkey AS BIGINT) END AS seed
       |      FROM nation),
       |l0 AS (SELECT node, seed AS label FROM n),
       |$rounds
       |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
  }

  /** Unrolled-CTE DuckDB mirror of Bfs.run: per round, the min-hop
    * relaxation from in-neighbors with seeds at distance 0. */
  private def bfsOracle(hops: Int): String = {
    val rounds = (1 to hops).map { i =>
      s"""d$i AS (
         |  SELECT d.node,
         |    CASE WHEN d.dist IS NULL THEN v.via
         |         WHEN v.via IS NULL THEN d.dist
         |         ELSE least(d.dist, v.via) END AS dist
         |  FROM d${i - 1} d LEFT JOIN (
         |    SELECT ed.dst AS node, min(p.dist) + 1 AS via
         |    FROM ed JOIN d${i - 1} p ON ed.src = p.node
         |    WHERE p.dist IS NOT NULL GROUP BY ed.dst) v USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH $coTradeSql,
       |ed AS (SELECT a AS src, b AS dst FROM e
       |       UNION ALL SELECT b, a FROM e),
       |d0 AS (SELECT CAST(n_nationkey AS BIGINT) AS node,
       |              CASE WHEN n_regionkey = 0
       |                   THEN CAST(0 AS BIGINT) END AS dist
       |       FROM nation),
       |$rounds
       |SELECT node, dist FROM d$hops ORDER BY node""".stripMargin
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
      Some(pagerankOracle(iters = 3, dampPct = 85))),

    // ---- triangle census of the co-trade graph -----------------------------
    // Undirected nation↔nation graph: an edge where customer nation and
    // supplier nation exchange at least the MEAN per-pair lineitem count
    // (a relative threshold, so the subgraph stays meaningful at any
    // scale factor). Reports edge/wedge/triangle counts and the global
    // clustering coefficient in exact integer ppm. The Spark side runs
    // the degree-ordered orientation (operators.Triangles — bounded
    // wedge fan-out on power-law graphs); the oracle closes a<b<c
    // wedges directly. Any acyclic orientation counts each triangle
    // exactly once, so the two agree bit-for-bit — the differential is
    // also property-tested on random graphs in TrianglesSpec.
    Q("q_triangle_count",
      (s, dir) => {
        Triangles.count(coTradeEdges(s, dir))
          .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
            expr("CASE WHEN n_wedges > 0 THEN n_triangles * 3000000L div n_wedges " +
              "ELSE 0L END").as("clustering_ppm"))
      },
      Some(s"""WITH $coTradeSql,
             |d AS (SELECT node, count(*) AS deg FROM (
             |        SELECT a AS node FROM e UNION ALL SELECT b FROM e)
             |      GROUP BY node),
             |tri AS (SELECT count(*) AS t
             |        FROM e e1 JOIN e e2 ON e2.a = e1.b
             |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |wg AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS ws FROM d)
             |SELECT (SELECT count(*) FROM d) AS n_nodes,
             |       (SELECT count(*) FROM e) AS n_edges,
             |       (SELECT t FROM tri)      AS n_triangles,
             |       CASE WHEN (SELECT ws FROM wg) > 0
             |            THEN CAST((SELECT t FROM tri) * 3000000 //
             |                      (SELECT ws FROM wg) AS BIGINT)
             |            ELSE 0 END AS clustering_ppm""".stripMargin)),

    // ---- market-basket co-occurrence mining --------------------------------
    // Brand pairs that appear together in the same order, ranked by
    // co-occurrence count — the support-counting kernel of frequent-
    // itemset mining. Scale: the per-order distinct-brand list is bounded
    // by order size (TPC-H ≤ 7 lineitems), so the orderkey self-join
    // fans out at most C(7,2) = 21 pairs per order — linear in orders,
    // never quadratic in the catalog; the part dimension broadcasts and
    // the pair aggregation is one map-side-combinable hash agg over a
    // keyspace capped at C(|brands|, 2). Ordering is fully deterministic
    // (count desc, then both keys), so top-k survives ties.
    Q("q_copurchase_pairs",
      (s, dir) => {
        val ob = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"))
          .join(broadcast(Tables.part(s, dir)
              .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand"))
          .distinct()
        ob.select(col("l_orderkey"), col("p_brand").as("brand_a"))
          .join(ob.select(col("l_orderkey"), col("p_brand").as("brand_b")),
            "l_orderkey")
          .filter(col("brand_a") < col("brand_b"))
          .groupBy(col("brand_a"), col("brand_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("brand_a"), col("brand_b"))
          .limit(100)
      },
      Some("""WITH ob AS (
             |  SELECT DISTINCT l.l_orderkey, p.p_brand
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
             |SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
             |       count(*) AS n_orders
             |FROM ob x JOIN ob y
             |  ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
             |GROUP BY 1, 2
             |ORDER BY n_orders DESC, brand_a, brand_b
             |LIMIT 100""".stripMargin)),

    // ---- semi-supervised label propagation ---------------------------------
    // Spread region labels from even-keyed nations (the seeds, clamped)
    // to the rest of the co-trade graph: 3 rounds of neighbor-majority
    // voting with smallest-label tie-break (operators.LabelProp) — the
    // entity/community-assignment kernel. Scale: per round ONE
    // edges⋈labels hash equi-join + one (dst, label) map-side-combinable
    // vote aggregate + one max_by; labels are node-count rows (broadcast
    // side while nodes ≪ edges); lineage cut per round. The oracle
    // unrolls all 3 rounds as CTEs, so clamping, majority counts, and
    // the tie rule are hash-checked.
    Q("q_label_propagation",
      (s, dir) => {
        val e = coTradeEdges(s, dir)
        val edges = e.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
        val nodes = Tables.nation(s, dir)
          .select(col("n_nationkey").cast("long").as("node"),
            when(col("n_nationkey") % 2 === 0,
              col("n_regionkey").cast("long")).as("seed"))
        LabelProp.run(nodes, edges, iters = 3)
          .orderBy(col("node"))
      },
      Some(labelPropOracle(iters = 3))),

    // ---- multi-source BFS reach --------------------------------------------
    // Hop distance from the region-0 nations through the co-trade graph
    // (operators.Bfs): the "within-k-hops" kernel — blast radius,
    // influence reach. 3 relaxation rounds; unreached nations stay null
    // (exact up to 3 hops — BFS truncation is sound, unlike label-prop).
    // Scale: per round one edges⋈dist equi-join (dist = node-count rows,
    // the broadcast side) + one map-side-combinable min agg; lineage cut
    // per round. The oracle unrolls the same 3 rounds as CTEs, so seed
    // init, min-relaxation, and null handling are all hash-checked.
    Q("q_bfs_reach",
      (s, dir) => {
        val e = coTradeEdges(s, dir)
        val edges = e.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
        val nodes = Tables.nation(s, dir)
          .select(col("n_nationkey").cast("long").as("node"),
            when(col("n_regionkey") === 0, lit(0L)).as("dist"))
        Bfs.run(nodes, edges, maxHops = 3)
          .orderBy(col("node"))
      },
      Some(bfsOracle(hops = 3)))
  )
}
