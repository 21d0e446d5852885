package graft.queries

import graft.{Q, Tables}
import graft.operators.Knn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational/window operators beyond the reference surface:
  * gap-based sessionization, rollup aggregates, running windows, and
  * embedding-cosine near-dup pairs. All oracle-checked.
  */
object AdvancedQueries {

  private val cosSql =
    """(list_reduce(list_prepend(0::DOUBLE,
      |    list_transform(range(len(a.embedding)),
      |      i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)),
      |  (acc, v) -> acc + v)
      | / (sqrt(list_reduce(list_prepend(0::DOUBLE,
      |      list_transform(a.embedding, v -> v::DOUBLE * v::DOUBLE)), (acc, v) -> acc + v))
      |  * sqrt(list_reduce(list_prepend(0::DOUBLE,
      |      list_transform(b.embedding, v -> v::DOUBLE * v::DOUBLE)), (acc, v) -> acc + v))))""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- gap-based sessionization (30-min islands) ----------------------
    // The batch analog of streaming session windows: break when the gap to
    // the previous event exceeds the threshold, number sessions with a
    // running sum, aggregate per session. One shuffle (by user), sorted
    // within partitions — linear at scale.
    Q("q_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prevTs = lag(col("ts"), 1).over(w)
        Tables.events(s, dir)
          .withColumn("brk",
            when(prevTs.isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(prevTs) > 1800, 1)
              .otherwise(0))
          .withColumn("sess", sum(col("brk")).over(run))
          .groupBy(col("user_id"), col("sess"))
          .agg(
            count(lit(1)).as("n"),
            min(unix_timestamp(col("ts"))).as("start_ep"),
            max(unix_timestamp(col("ts"))).as("end_ep"))
          .orderBy(col("user_id"), col("sess"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |           OR CAST(floor(epoch(ts)) AS BIGINT) -
             |              CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts,
             |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
             |  FROM g)
             |SELECT user_id, sess, count(*) AS n,
             |       min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_ep,
             |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_ep
             |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin)),

    // ---- rollup: per-type counts + grand total --------------------------
    Q("q_rollup_counts",
      (s, dir) => Tables.events(s, dir)
        .rollup(col("event_type"))
        .agg(
          grouping(col("event_type")).cast("int").as("g"),
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_v"))
        .orderBy(col("g"), col("event_type")),
      Some("""SELECT event_type, CAST(grouping(event_type) AS INTEGER) AS g,
             |       count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
             |FROM events GROUP BY ROLLUP(event_type)
             |ORDER BY g, event_type""".stripMargin)),

    // ---- running (cumulative) sum per key, exact decimal ----------------
    Q("q_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast("decimal(18,6)")).over(w)
              .cast("double").as("run"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6)))
             |       OVER (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ---- embedding-cosine near-dup pairs (brute; LSH path is
    //      q_nn_lsh_bucketed) --------------------------------------------
    Q("q_embedding_neardup",
      (s, dir) => {
        val a = Tables.embeddings(s, dir).select(
          col("vec_id").as("id_a"), col("embedding").as("__va"))
        val b = Tables.embeddings(s, dir).select(
          col("vec_id").as("id_b"), col("embedding").as("__vb"))
        a.join(b, col("id_a") < col("id_b"))
          .withColumn("__sim", Knn.cosine(col("__va"), col("__vb")))
          .filter(col("__sim") >= 0.45)
          .select(col("id_a"), col("id_b"),
            floor(col("__sim") * 1e6).cast("long").as("sim_ppm"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |       CAST(floor($cosSql * 1e6) AS BIGINT) AS sim_ppm
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE $cosSql >= 0.45
              |ORDER BY id_a, id_b""".stripMargin))
  )
}
