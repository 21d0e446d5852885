package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the expectations /
  * contract-validation step of an ingest pipeline).
  *
  * Row-level rules (not-null, range, domain membership) all evaluate in
  * ONE scan — each rule is a conditional sum in a single aggregate, so
  * adding rules costs no extra passes. Table-level rules (key
  * uniqueness, referential integrity) each contribute their own
  * aggregate/anti-join, built to the same one-row audit shape so the
  * report unions cleanly. At 100 TB: the row-rule scan is the same scan
  * the ingest already does; referential checks broadcast the parent key
  * set when the parent is dimension-sized and shuffle otherwise.
  */
object Quality {

  /** One row per rule: (rule, n_violations). `rules` map a name to a
    * predicate that is TRUE for violating rows. */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map { case (name, pred) =>
      sum(coalesce(pred.cast("long"), lit(0L))).as(name)
    }
    val stacked = rules
      .map { case (name, _) => s"'$name', coalesce(`$name`, 0L)" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)")
  }

  /** Key-uniqueness audit: violations = rows beyond the first per key. */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(keys.head), keys.tail.map(col): _*))
        .as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Referential integrity: child keys with no parent row. */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(broadcast(parent.select(col(parentKey))),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
}
