package graft.sources

import graft.operators.TableManifest
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan,
  SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Analyzer-native SQL `UPDATE t SET ... WHERE ...` on graft tables —
  * the missing half of the DML surface (DELETE FROM already lands via
  * DataSourceV2's SupportsDelete; UPDATE previously required the
  * `CALL graft.update(...)` detour). Registered as a post-hoc
  * resolution rule by [[graft.GraftExtensions]]: once the analyzer has
  * resolved the [[UpdateTable]] command against a graft catalog/source
  * relation, the rule renders the condition and SET expressions back to
  * SQL text and replaces the plan with a runnable command that executes
  * [[TableManifest.updateWhere]] — the match-proportional merge-on-read
  * commit (one scan + a write of the matched rows + an O(1) tombstone),
  * NEVER Spark's group-based row-level rewrite of the whole table.
  *
  * Translation discipline mirrors the DELETE path
  * ([[GraftTableSource.toPredicateSql]]): anything without an exact,
  * re-parseable SQL form — subqueries, non-deterministic expressions,
  * nested-field SET targets — fails the UPDATE at analysis, never
  * under- or over-updates. Resolved expressions render via
  * `Expression.sql` with qualifiers stripped, so the text re-analyzes
  * against the bare table schema inside updateWhere.
  */
object GraftUpdateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(rel, assignments, condition) if u.resolved =>
        graftTableOf(rel) match {
          case Some(t) =>
            require(t.pinnedVersion.isEmpty,
              "cannot UPDATE a pinned VERSION AS OF read")
            GraftUpdateCommand(t.tablePath,
              assignments.map(renderAssignment),
              condition.map(render).getOrElse("true"))
          case None => u // not a graft table: leave for Spark's own path
        }
    }

  private def graftTableOf(plan: LogicalPlan): Option[GraftTable] =
    plan match {
      case SubqueryAlias(_, child)  => graftTableOf(child)
      case r: DataSourceV2Relation  => r.table match {
        case t: GraftTable => Some(t)
        case _             => None
      }
      case _ => None
    }

  private def renderAssignment(a: Assignment): (String, String) =
    a.key match {
      case k: AttributeReference => k.name -> render(a.value)
      case other => throw new IllegalArgumentException(
        "graft UPDATE supports top-level columns in SET only, got " +
          s"${other.sql} — update the whole struct column instead")
    }

  /** Resolved expression → SQL text that re-parses identically, or an
    * analysis-time refusal. */
  private def render(e: Expression): String = {
    require(e.deterministic,
      s"non-deterministic expression in graft UPDATE: ${e.sql} — the " +
        "update re-evaluates SQL text once per matched row set; a " +
        "non-deterministic rendering would not be the value the " +
        "analyzer saw")
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"subquery in graft UPDATE is not supported: ${e.sql}")
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql
  }
}

/** Eagerly-executed leaf command [[GraftUpdateRule]] plants in place of
  * the resolved UpdateTable: one [[TableManifest.updateWhere]] commit,
  * returning (version, rows_updated) like `CALL graft.update`. */
case class GraftUpdateCommand(path: String,
    assignments: Seq[(String, String)], predicateSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("rows_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val before = TableManifest.versions(spark, path).last
    val v = TableManifest.updateWhere(spark, path, predicateSql,
      assignments)
    val n = if (v == before) 0L
      else TableManifest.updatedRowCount(spark, path, v)
    Seq(Row(v, n))
  }
}
