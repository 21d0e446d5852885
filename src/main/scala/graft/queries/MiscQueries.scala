package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Set operations, pivots, lateral explode, conditional aggregation, and
  * string functions — rounding out the relational surface beyond the
  * reference (SURVEY §2.8 notes the reference has none of these).
  */
object MiscQueries {

  val all: Seq[Q] = Seq(

    // ---- INTERSECT / EXCEPT over key sets -------------------------------
    Q("q_set_ops",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val buyers = e.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val errorers = e.filter(col("event_type") === "error")
          .select(col("user_id")).distinct()
        val both = buyers.intersect(errorers)
          .withColumn("set_kind", lit("both"))
        val buyOnly = buyers.except(errorers)
          .withColumn("set_kind", lit("purchase_only"))
        both.unionByName(buyOnly).orderBy(col("set_kind"), col("user_id"))
      },
      Some("""WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             |errs AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
             |SELECT user_id, 'both' AS set_kind FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errs) t
             |UNION ALL
             |SELECT user_id, 'purchase_only' AS set_kind FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errs) t
             |ORDER BY set_kind, user_id""".stripMargin)),

    // ---- pivot: per-user counts by event type (portable CASE form) ------
    Q("q_pivot_counts",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === types.head, 1)).as(s"n_${types.head}"),
            types.tail.map(t =>
              count(when(col("event_type") === t, 1)).as(s"n_$t")): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
             |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
             |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- lateral explode: global token frequencies ----------------------
    Q("q_token_frequencies",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
      Some("""SELECT token, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
             |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ---- conditional aggregation (FILTER clause semantics) --------------
    Q("q_conditional_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("value") > 250, 1)).as("n_big"),
          sum(when(col("value") > 250, col("value").cast("decimal(18,6)")))
            .cast("double").as("sum_big"),
          max(when(col("event_type") === "purchase", col("value"))).as("max_purchase"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE value > 250) AS n_big,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE value > 250) AS DOUBLE) AS sum_big,
             |  max(value) FILTER (WHERE event_type = 'purchase') AS max_purchase
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- string function suite ------------------------------------------
    Q("q_string_funcs",
      (s, dir) => Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          concat_ws("-", col("p_type"), col("p_brand")).as("type_brand"),
          translate(col("p_name"), "aeiou", "_____").as("consonant_mask"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substr(p_name, 1, 5) AS name5, len(p_name) AS name_len,
             |  coalesce(regexp_extract(p_brand, '([0-9]+)', 1), '') AS brand_num,
             |  concat_ws('-', p_type, p_brand) AS type_brand,
             |  translate(p_name, 'aeiou', '_____') AS consonant_mask
             |FROM part ORDER BY p_partkey""".stripMargin))
  )
}
