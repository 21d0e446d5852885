package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** TPC-H-shaped multi-join analytics over the star schema — the headline
  * "would this survive 100 TB" plans: dimension sides broadcast, the fact
  * table (lineitem) never shuffles before partial aggregation.
  *
  * Money arithmetic is integer-scaled (prices are exact 2-decimal, verified
  * on the testdata): cents × percent points as longs, summed exactly, one
  * double division at the end. Double→decimal casts of double *products*
  * are NOT portable (Spark rounds the shortest decimal repr, DuckDB rounds
  * in binary — observed mismatch in the 8th decimal), hence cents.
  */
object StarJoinQueries {

  /** l_extendedprice in integer cents. */
  private def cents = round(col("l_extendedprice") * 100).cast("long")

  /** Revenue scaled by 1e4: cents × (100 − discount points), exact. */
  private def revScaled =
    cents * (lit(100L) - round(col("l_discount") * 100).cast("long"))

  val all: Seq[Q] = Seq(

    // ---- TPC-H Q3 shape: top unshipped-revenue orders for one segment ---
    Q("q_star_top_revenue",
      (s, dir) => {
        val cutoff = "2000-01-01"
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
          .select(col("l_orderkey"), revScaled.as("rev"))
        l.join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg((sum(col("rev")) / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '2000-01-01'
             |  AND l_shipdate > TIMESTAMP '2000-01-01'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- TPC-H Q5 shape: revenue by nation inside one region ------------
    // All five dimension/bridge tables broadcast; lineitem joins against
    // the composed broadcast and aggregates without a pre-join shuffle.
    Q("q_star_region_revenue",
      (s, dir) => {
        val dims = Tables.region(s, dir).filter(col("r_name") === "ASIA")
          .join(Tables.nation(s, dir), col("r_regionkey") === col("n_regionkey"))
          .join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"))
          .select(col("n_name"), col("c_custkey"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(s, dir).select(col("l_orderkey"), revScaled.as("rev"))
        l.join(broadcast(o.join(broadcast(dims), col("o_custkey") === col("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"))
          .agg((sum(col("rev")) / 10000.0).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
             |  count(*) AS n_items
             |FROM region JOIN nation ON r_regionkey = n_regionkey
             |  JOIN customer ON n_nationkey = c_nationkey
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1999-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- TPC-H Q1 shape: pricing summary by flag/status -----------------
    // Pure scan + hash aggregate over the widest fact table: the raw
    // map-side-combine throughput benchmark.
    Q("q_star_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).cast("double").as("sum_qty"),
          (sum(cents) / 100.0).as("sum_base_price"),
          (sum(revScaled) / 10000.0).as("sum_disc_price"),
          (sum(revScaled * (lit(100L) + round(col("l_tax") * 100).cast("long")))
            / 1000000.0).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
             |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
             |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
             |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
             |      * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0 AS sum_charge,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- shipping priority (TPC-H Q3 shape) --------------------------------
    // Top-10 unshipped high-revenue orders for one market segment: both
    // date filters ride the scans (PushedFilters), customer broadcasts,
    // lineitem partially aggregates by orderkey before the top-k, and
    // the final LIMIT plans as TakeOrderedAndProject — the fact table
    // never fully sorts. Revenue in exact cents×percent (see file
    // doc-comment).
    Q("q_star_ship_priority",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"),
            (floor(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("__rev"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(sum(col("__rev")).as("revenue_cp"))
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("revenue_cp"))
          .orderBy(col("revenue_cp").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT l.l_orderkey AS o_orderkey,
             |  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
             |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             |    AS revenue_cp
             |FROM lineitem l
             |JOIN orders o   ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey  = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2
             |ORDER BY revenue_cp DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- nation trade volume (TPC-H Q7 shape) -------------------------------
    // Yearly revenue between every (supplier nation → customer nation)
    // pair: the two nation-keyed dimension chains broadcast; lineitem
    // joins orders on the key both tables already carry and aggregates
    // to |nations|²×years rows. The same plan at 100 TB: only the fact
    // scan grows.
    Q("q_star_nation_volume",
      (s, dir) => {
        val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val supp = Tables.supplier(s, dir)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
            (floor(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("__rev"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(count(lit(1)).as("n_items"), sum(col("__rev")).as("revenue_cp"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      },
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |  CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             |    AS revenue_cp
             |FROM lineitem l
             |JOIN orders o    ON l.l_orderkey = o.o_orderkey
             |JOIN customer c  ON o.o_custkey  = c.c_custkey
             |JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
             |JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
             |JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
             |GROUP BY 1, 2, 3
             |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin))
  )
}
