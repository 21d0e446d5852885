package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * shape, Spark-first: a constraint SUITE evaluates in ONE aggregate
  * pass over the table (every row-level predicate folds to a violation
  * count map-side; nothing materializes per-row verdicts), plus one
  * aggregate per uniqueness key and one anti-join per referential
  * check — the shapes those constraints irreducibly need. The output is
  * a tiny verdict table (check, violations, passed), which is what a
  * pipeline gate consumes: at 100 TB the audit costs one scan, not one
  * scan per check.
  *
  * Reference: the reference pipeline validates row counts after load
  * (`database_and_model_tools.py:127-209` re-verifies three tables);
  * this generalizes that manual step into a composable gate. */
object Expectations {

  /** Row-level checks: each (name, predicate) folds to a violation
    * count in ONE pass — `violations` = rows where the predicate is
    * FALSE or NULL (a null comparison is a failed expectation, not a
    * free pass). Returns (check, violations, passed). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    val agged = df.agg(
      count(lit(1)).as("__n"),
      checks.map { case (name, cond) =>
        sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(name)
      }: _*)
    val arms = checks.map { case (name, _) =>
      struct(lit(name).as("check_name"),
        coalesce(col(name), lit(0L)).as("violations"))
    }
    agged.select(explode(array(arms: _*)).as("__c"))
      .select(col("__c.check_name"), col("__c.violations"),
        (col("__c.violations") === 0L).as("passed"))
  }

  /** Uniqueness of `keyCols`: violations = rows carrying a duplicated
    * key (a key seen k > 1 times contributes k). One map-side-combinable
    * aggregate; only (key, count>1) survivors reach the second fold. */
  def uniqueness(df: DataFrame, keyCols: Seq[String],
      name: String): DataFrame = {
    require(keyCols.nonEmpty)
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__k"))
      .filter(col("__k") > 1L)
      .agg(coalesce(sum(col("__k")), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Referential integrity: violations = child rows whose `fkCol` has no
    * match in `parent.pkCol` (nulls violate — an FK that points nowhere
    * is the failure this check exists for). A broadcast-friendly
    * anti-join: only the parent's key column crosses the wire. */
  def referential(child: DataFrame, fkCol: String, parent: DataFrame,
      pkCol: String, name: String): DataFrame =
    child.select(col(fkCol).as("__fk"))
      .join(parent.select(col(pkCol).as("__fk")).distinct(),
        Seq("__fk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
}
