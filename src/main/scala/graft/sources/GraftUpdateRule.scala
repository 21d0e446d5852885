package graft.sources

import graft.operators.TableManifest
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertStarAction, LogicalPlan, MergeIntoTable,
  SubqueryAlias, UpdateStarAction, UpdateTable, DeleteFromTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, count, lit}
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

  private[sources] def graftTableOf(plan: LogicalPlan): Option[GraftTable] =
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
    * analysis-time refusal. Timestamp LITERALS re-render as
    * `timestamp_micros(<epoch>L)` instead of `Expression.sql`'s
    * wall-clock `TIMESTAMP '...'` text: the rendered predicate is stored
    * in the tombstone and re-parsed under EVERY future reader's
    * `spark.sql.session.timeZone` — a wall-clock rendering would shift
    * which rows the tombstone masks whenever a reader's zone differs
    * from the writer's (the same hazard the Filter-pushdown path's
    * litSql fixed; dates and TIMESTAMP_NTZ are zone-free and render
    * as-is). */
  private[sources] def render(e: Expression): String = {
    require(e.deterministic,
      s"non-deterministic expression in graft UPDATE: ${e.sql} — the " +
        "update re-evaluates SQL text once per matched row set; a " +
        "non-deterministic rendering would not be the value the " +
        "analyzer saw")
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"subquery in graft UPDATE is not supported: ${e.sql}")
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
      case org.apache.spark.sql.catalyst.expressions.Literal(
          v: Long, org.apache.spark.sql.types.TimestampType) =>
        org.apache.spark.sql.catalyst.expressions.MicrosToTimestamp(
          org.apache.spark.sql.catalyst.expressions.Literal(v))
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
    // merged schema: a SET on a late-added column reaches null-padded
    // legacy batches, matching the catalog's read surface
    val v = TableManifest.updateWhere(spark, path, predicateSql,
      assignments, Some(GraftTableSource.tableSchema(spark, path, None,
        mergeSchema = true)))
    val n = if (v == before) 0L
      else TableManifest.updatedRowCount(spark, path, v)
    Seq(Row(v, n))
  }
}

/** Analyzer-native SQL `DELETE FROM` for predicates BEYOND the DSv2
  * Filter vocabulary. The SupportsDelete path only sees predicates that
  * translate to pushed `Filter`s, so `DELETE FROM graft.t WHERE
  * id % 7 = 0` used to refuse at analysis even though
  * [[TableManifest.deleteWhere]] stores arbitrary predicate SQL in the
  * tombstone. This post-hoc rule (running before the strategy that
  * would refuse) renders the resolved condition with the same
  * discipline as [[GraftUpdateRule]] — deterministic, no subqueries,
  * qualifiers stripped — and routes it straight into the
  * match-proportional MoR tombstone commit; anything unrenderable still
  * fails at analysis, never under- or over-deletes. Output mirrors
  * SQL DELETE (no rows). */
object GraftDeleteRule extends Rule[LogicalPlan] {
  import GraftUpdateRule.{graftTableOf, render}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case d: DeleteFromTable if d.table.resolved && d.condition.resolved =>
        graftTableOf(d.table) match {
          case Some(t) =>
            require(t.pinnedVersion.isEmpty,
              "cannot DELETE from a pinned VERSION AS OF read")
            GraftDeleteCommand(t.tablePath, render(d.condition))
          case None => d
        }
    }
}

/** The planted delete: ONE [[TableManifest.deleteWhere]] tombstone
  * commit — O(1) bytes regardless of match count or table size. */
case class GraftDeleteCommand(path: String, predicateSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    TableManifest.deleteWhere(spark, path, predicateSql,
      Some(GraftTableSource.tableSchema(spark, path, None,
        mergeSchema = true)))
    Nil
  }
}

/** Analyzer-native SQL `MERGE INTO` on graft tables, for the canonical
  * upsert shape:
  *
  * {{{
  *   MERGE INTO graft.t AS t USING src AS s ON t.k = s.k [AND ...]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   [WHEN NOT MATCHED BY SOURCE THEN DELETE]   -- sync-to-source
  * }}}
  *
  * Registered post-hoc by [[graft.GraftExtensions]]. The translation is
  * deliberately narrow (the refuse-untranslatable discipline): the ON
  * condition must be a conjunction of target-column = source-column
  * equalities, the only matched action `UPDATE SET *`, the only
  * not-matched action `INSERT *`, no not-matched-by-source clauses, no
  * schema evolution — anything else fails at analysis with the library
  * route (`TableManifest.mergeInto`) named in the error. Semantics are
  * exact SQL MERGE: matched target rows are replaced by their source
  * row (multiplicity preserved — two target rows on one key both
  * update), unmatched target rows pass through untouched (null-key rows
  * never match, the 3VL join rule), unmatched source rows insert, and a
  * source key matching several SOURCE rows is the standard cardinality
  * violation, refused at run time before anything commits. */
object GraftMergeRule extends Rule[LogicalPlan] {
  import GraftUpdateRule.graftTableOf

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      // NOT m.resolved: the table advertises ACCEPT_ANY_SCHEMA (for the
      // manifest's schema-evolution writes), which makes the analyzer
      // skip schema resolution for MERGE — the ON condition arrives
      // with unresolved attributes and would die in CheckAnalysis. The
      // rule resolves them itself against the two relations (qualifier-
      // aware, the session resolver), which is all the narrow star
      // translation needs.
      case m: MergeIntoTable
          if m.targetTable.resolved && m.sourceTable.resolved =>
        graftTableOf(m.targetTable) match {
          case Some(t) =>
            require(t.pinnedVersion.isEmpty,
              "cannot MERGE into a pinned VERSION AS OF read")
            require(!m.withSchemaEvolution,
              "graft MERGE does not support WITH SCHEMA EVOLUTION — " +
                "evolve via an explicit different-arity append instead")
            val dropUnmatchedTarget = m.notMatchedBySourceActions match {
              case Nil => false // unmatched target rows pass through
              case Seq(DeleteAction(None)) => true // full sync-to-source
              case other => throw new IllegalArgumentException(
                "graft MERGE supports WHEN NOT MATCHED BY SOURCE THEN " +
                  s"DELETE (unconditional) or no clause, got: $other — " +
                  "use TableManifest.deleteWhere for conditional " +
                  "not-matched-by-source logic")
            }
            val matchedMode = m.matchedActions match {
              case Seq(UpdateStarAction(None)) => "update" // upsert half
              case Seq(DeleteAction(None))     => "delete" // key-list del
              case Nil                         => "keep"   // insert-only
              case other => throw new IllegalArgumentException(
                "graft MERGE supports WHEN MATCHED THEN UPDATE SET * or " +
                  "WHEN MATCHED THEN DELETE (unconditional) or no " +
                  s"matched clause, got: $other — use " +
                  "TableManifest.mergeInto for custom merge logic")
            }
            val insertNew = m.notMatchedActions match {
              case Seq(InsertStarAction(None)) => true
              case Nil                         => false
              case other => throw new IllegalArgumentException(
                "graft MERGE supports WHEN NOT MATCHED THEN INSERT * " +
                  s"(unconditional) or no clause, got: $other")
            }
            require(matchedMode != "keep" || insertNew ||
              dropUnmatchedTarget, "MERGE needs at least one clause")
            val tgtOut = m.targetTable.outputSet
            val srcOut = m.sourceTable.outputSet
            val cond = m.mergeCondition.transformUp {
              case u: UnresolvedAttribute =>
                m.targetTable.resolve(u.nameParts, conf.resolver)
                  .orElse(m.sourceTable.resolve(u.nameParts,
                    conf.resolver))
                  .getOrElse(throw new IllegalArgumentException(
                    s"MERGE ON references unknown column ${u.sql}"))
            }
            val keys = splitConjuncts(cond).map {
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if tgtOut.contains(a) && srcOut.contains(b) => a.name
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if tgtOut.contains(b) && srcOut.contains(a) => b.name
              case other => throw new IllegalArgumentException(
                "graft MERGE ON must be a conjunction of target-column " +
                  s"= source-column equalities, got: ${other.sql}")
            }
            GraftMergeCommand(t.tablePath, m.sourceTable, keys,
              dropUnmatchedTarget, matchedMode, insertNew)
          case None => m
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** The planted merge command: one CoW snapshot commit of
  * `kept ∪ matched ∪ inserted` — kept = target rows with no source key
  * match (anti join; dropped entirely under NOT MATCHED BY SOURCE
  * DELETE), matched = per `matchedMode`: the inner join's SOURCE rows
  * (UPDATE SET * — one per MATCHED TARGET row, so target-side
  * multiplicity is preserved), nothing (DELETE — the key-list deletion
  * idiom), or the matched target rows unchanged (no matched clause —
  * insert-if-absent), inserted = source rows with no target match when
  * INSERT * is present. Shuffles on the merge keys; AQE broadcasts a
  * small source. Returns (version, rows_matched, rows_inserted). */
case class GraftMergeCommand(path: String, sourcePlan: LogicalPlan,
    keyCols: Seq[String], dropUnmatchedTarget: Boolean = false,
    matchedMode: String = "update", insertNew: Boolean = true)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("rows_matched", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src0 =
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark, sourcePlan)
    val tgtSchema =
      GraftTableSource.tableSchema(spark, path, None, mergeSchema = true)
    // align the source to the target schema by name (the INSERT * /
    // UPDATE SET * contract), coercing types the way the resolver would
    val aligned = src0.select(tgtSchema.fields.map(f =>
      col(s"`${f.name}`").cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    // SQL cardinality rule: a target row may match at most ONE source
    // row — refuse duplicate source keys before anything commits
    val dup = aligned.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1)
      .collect()
    require(dup.isEmpty,
      s"MERGE cardinality violation: source has duplicate rows on " +
        s"(${keyCols.mkString(", ")}): ${dup.headOption.getOrElse("")}")
    // content derives from the table: commitDerivedSnapshot's pinned
    // re-derive loop, so an append racing the merge is folded by a
    // retry, never lost. The matched/inserted counts ride the WRITE
    // pass as observed metrics (CollectMetrics on the union branches) —
    // never separate count jobs; one join+write pass, full stop.
    var updObs: org.apache.spark.sql.Observation = null
    var insObs: org.apache.spark.sql.Observation = null
    var nMatchedDeleted = 0L
    val v = TableManifest.commitDerivedSnapshot(spark, path, { v0 =>
      val tgt = TableManifest.readAt(spark, path, v0, Some(tgtSchema))
      // WHEN NOT MATCHED BY SOURCE THEN DELETE: unmatched target rows
      // drop instead of passing through — the sync-to-source idiom
      val kept =
        if (dropUnmatchedTarget) tgt.limit(0)
        else tgt.join(aligned.select(keyCols.map(col): _*),
          keyCols, "left_anti")
      val matched = matchedMode match {
        case "update" => tgt.select(keyCols.map(col): _*)
          .join(aligned, keyCols, "inner")
          .select(tgt.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
        case "delete" =>
          // deleted rows never reach the written union, so their count
          // can't ride it as an observed metric — one keys-only semi
          // count per attempt (column-pruned scan), audit-only
          nMatchedDeleted = tgt.select(keyCols.map(col): _*)
            .join(aligned.select(keyCols.map(col): _*), keyCols,
              "left_semi").count()
          tgt.limit(0) // matched target rows drop
        case _ => tgt.join(aligned.select(keyCols.map(col): _*),
          keyCols, "left_semi") // matched rows pass through unchanged
      }
      val inserted =
        if (insertNew) aligned.join(tgt.select(keyCols.map(col): _*),
          keyCols, "left_anti")
        else aligned.limit(0)
      updObs = new org.apache.spark.sql.Observation()
      insObs = new org.apache.spark.sql.Observation()
      kept.unionByName(matched.observe(updObs, count(lit(1)).as("n")))
        .unionByName(inserted.observe(insObs, count(lit(1)).as("n")))
    })
    val nMatched =
      if (matchedMode == "delete") nMatchedDeleted
      else updObs.get("n").asInstanceOf[Long]
    Seq(Row(v, nMatched, insObs.get("n").asInstanceOf[Long]))
  }
}
