package graft.sources

import graft.operators.TableManifest
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, InsertStarAction, LogicalPlan,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction,
  UpdateTable, DeleteFromTable}
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

/** Analyzer-native SQL `MERGE INTO` on graft tables:
  *
  * {{{
  *   MERGE INTO graft.t AS t USING src AS s ON t.k = s.k [AND ...]
  *   [WHEN MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET c = expr, ... | DELETE] ...
  *   [WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (cols) VALUES (exprs)] ...
  *   [WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET c = expr, ...] ...
  * }}}
  *
  * Registered post-hoc by [[graft.GraftExtensions]]. Every standard
  * clause shape is accepted — star actions, EXPLICIT assignment lists
  * (expressions over both pre-images: `SET t.v = t.v + s.delta`),
  * conditional clauses, and the SCD-2 `NOT MATCHED BY SOURCE THEN
  * UPDATE` — rendered with the [[GraftUpdateRule]] discipline
  * (deterministic, no subqueries, timestamp literals zone-independent,
  * top-level SET targets only) and routed into
  * [[TableManifest.mergeWhere]]: the MATCH-PROPORTIONAL merge-on-read
  * commit (equality tombstone + update-keyspace replacement batch, one
  * marker) — never a copy-on-write table rewrite. Scoping follows SQL:
  * matched clauses see both sides (`__t`/`__s`), NOT MATCHED clauses
  * see the source only, NOT MATCHED BY SOURCE clauses the target only —
  * out-of-scope references are refused at analysis. Other exact-SQL
  * semantics: first-match-wins clause resolution, target-side
  * multiplicity preserved, null keys never match (3VL), duplicate
  * SOURCE keys are the standard cardinality violation refused at run
  * time before anything commits, and the ON clause must pair SAME-NAMED
  * target/source columns — a cross-named key (`ON t.id = s.src_id`) is
  * refused rather than silently joined on the wrong source column —
  * the star actions and the tombstone keys map by NAME, so their
  * contract already requires the names to line up. */
object GraftMergeRule extends Rule[LogicalPlan] {
  import GraftUpdateRule.graftTableOf
  import graft.operators.TableManifest.{MergeBySource, MergeInsert,
    MergeMatched}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      // NOT m.resolved: the table advertises ACCEPT_ANY_SCHEMA (for the
      // manifest's schema-evolution writes), which makes the analyzer
      // skip schema resolution for MERGE — the ON condition and clause
      // conditions arrive with unresolved attributes and would die in
      // CheckAnalysis. The rule resolves them itself against the two
      // relations (qualifier-aware, the session resolver).
      case m: MergeIntoTable
          if m.targetTable.resolved && m.sourceTable.resolved =>
        graftTableOf(m.targetTable) match {
          case Some(t) =>
            require(t.pinnedVersion.isEmpty,
              "cannot MERGE into a pinned VERSION AS OF read")
            val tgtOut = m.targetTable.outputSet
            val srcOut = m.sourceTable.outputSet
            val tgtNamesLower = m.targetTable.output
              .map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
            // WITH SCHEMA EVOLUTION: source-only top-level columns
            // widen the target (nullable, source types) before the
            // merge — one zero-row footer commit, the ADD COLUMN
            // machinery — so SET * / INSERT * carry them and legacy
            // rows read NULL (the Delta semantics)
            val evolve: Seq[(String, org.apache.spark.sql.types
                .DataType)] =
              if (!m.withSchemaEvolution) Nil
              else m.sourceTable.output.filterNot(a =>
                tgtNamesLower.contains(
                  a.name.toLowerCase(java.util.Locale.ROOT)))
                .map(a => a.name -> a.dataType)
            val evolveNames = evolve.map(_._1
              .toLowerCase(java.util.Locale.ROOT)).toSet

            def resolveWith(e: Expression,
                order: Seq[LogicalPlan]): Expression = e.transformUp {
              case u: UnresolvedAttribute =>
                order.view.flatMap(_.resolve(u.nameParts, conf.resolver))
                  .headOption
                  .getOrElse(throw new IllegalArgumentException(
                    s"MERGE references unknown column ${u.sql}"))
            }
            def resolveExpr(e: Expression): Expression =
              resolveWith(e, Seq(m.targetTable, m.sourceTable))
            // expression -> SQL over the __t/__s-aliased frames.
            // `scope` pins which sides the clause may see (SQL rules:
            // matched = both, NOT MATCHED = source, NOT MATCHED BY
            // SOURCE = target) — an out-of-scope reference refuses at
            // analysis instead of failing obscurely at run time.
            // UNQUALIFIED names resolve against the clause's own scope
            // first (a NOT MATCHED condition's bare `v` is the source's
            // v, per SQL — only the source row exists there).
            def renderScoped(raw: Expression, scope: String,
                what: String): String = {
              val e = resolveWith(raw,
                if (scope == "source")
                  Seq(m.sourceTable, m.targetTable)
                else Seq(m.targetTable, m.sourceTable))
              require(e.deterministic,
                s"non-deterministic MERGE $what: ${e.sql}")
              require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
                s"subquery in MERGE $what is not supported: ${e.sql}")
              e.transform {
                case a: AttributeReference if tgtOut.contains(a) =>
                  require(scope != "source",
                    s"MERGE $what references target column ${a.name} — " +
                      "NOT MATCHED clauses see source columns only")
                  a.withQualifier(Seq("__t"))
                case a: AttributeReference if srcOut.contains(a) =>
                  require(scope != "target",
                    s"MERGE $what references source column ${a.name} — " +
                      "NOT MATCHED BY SOURCE clauses see target " +
                      "columns only")
                  a.withQualifier(Seq("__s"))
                case org.apache.spark.sql.catalyst.expressions.Literal(
                    v: Long, org.apache.spark.sql.types.TimestampType) =>
                  org.apache.spark.sql.catalyst.expressions
                    .MicrosToTimestamp(
                      org.apache.spark.sql.catalyst.expressions.Literal(v))
              }.sql
            }
            def renderAssigns(assigns: Seq[Assignment],
                scope: String): Seq[(String, String)] =
              assigns.map { a =>
                val key = resolveExpr(a.key) match {
                  case k: AttributeReference if tgtOut.contains(k) =>
                    k.name
                  // under WITH SCHEMA EVOLUTION an assignment may
                  // target a source-only column (it resolves to the
                  // SOURCE attr pre-widening; the command widens the
                  // table before the merge, making it a target column)
                  case k: AttributeReference if srcOut.contains(k) &&
                      evolveNames.contains(
                        k.name.toLowerCase(java.util.Locale.ROOT)) =>
                    k.name
                  case other => throw new IllegalArgumentException(
                    "graft MERGE assigns top-level TARGET columns " +
                      s"only, got ${other.sql} — update the whole " +
                      "struct column instead")
                }
                key -> renderScoped(a.value, scope, "assignment")
              }

            val matchedClauses = m.matchedActions.map {
              case UpdateStarAction(c) => MergeMatched("update",
                c.map(renderScoped(_, "both", "condition")))
              case UpdateAction(c, assigns, _) => MergeMatched("update",
                c.map(renderScoped(_, "both", "condition")),
                Some(renderAssigns(assigns, "both")))
              case DeleteAction(c) => MergeMatched("delete",
                c.map(renderScoped(_, "both", "condition")))
              case other => throw new IllegalArgumentException(
                "graft MERGE matched actions are UPDATE SET */UPDATE " +
                  s"SET assignments/DELETE, got: $other")
            }
            val insertClauses = m.notMatchedActions.map {
              case InsertStarAction(c) => MergeInsert(
                c.map(renderScoped(_, "source", "condition")))
              case InsertAction(c, assigns) => MergeInsert(
                c.map(renderScoped(_, "source", "condition")),
                Some(renderAssigns(assigns, "source")))
              case other => throw new IllegalArgumentException(
                "graft MERGE not-matched actions are INSERT * or " +
                  s"INSERT (cols) VALUES (exprs), got: $other")
            }
            val nmbsClauses = m.notMatchedBySourceActions.map {
              case DeleteAction(c) => MergeBySource("delete",
                c.map(renderScoped(_, "target", "condition")))
              case UpdateAction(c, assigns, _) => MergeBySource("update",
                c.map(renderScoped(_, "target", "condition")),
                Some(renderAssigns(assigns, "target")))
              case other => throw new IllegalArgumentException(
                "graft MERGE not-matched-by-source actions are DELETE " +
                  s"or UPDATE SET assignments, got: $other (UPDATE " +
                  "SET * has no source row to read)")
            }
            require(matchedClauses.nonEmpty || insertClauses.nonEmpty ||
              nmbsClauses.nonEmpty, "MERGE needs at least one clause")

            val cond = resolveExpr(m.mergeCondition)
            val keys = splitConjuncts(cond).map {
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if tgtOut.contains(a) && srcOut.contains(b) => (a, b)
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if tgtOut.contains(b) && srcOut.contains(a) => (b, a)
              case other => throw new IllegalArgumentException(
                "graft MERGE ON must be a conjunction of target-column " +
                  s"= source-column equalities, got: ${other.sql}")
            }.map { case (ta, sa) =>
              require(ta.name.equalsIgnoreCase(sa.name),
                s"graft MERGE ON pairs differently-named columns " +
                  s"(${ta.name} = ${sa.name}); star actions and the " +
                  "equality tombstone map by NAME, so rename the " +
                  "source key to the target's")
              ta.name
            }
            GraftMergeCommand(t.tablePath, m.sourceTable, keys,
              matchedClauses, insertClauses, nmbsClauses, evolve)
          case None => m
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** The planted merge command: ONE [[TableManifest.mergeWhere]]
  * merge-on-read commit — equality tombstone over the acted-on keys +
  * an update-keyspace replacement batch (post-images, key-group
  * pass-throughs, inserts), flipped by a single `kind=merge` marker.
  * Match-proportional: cost scales with the matched/inserted rows, not
  * the table (`Stress mormerge`), closing the last copy-on-write
  * mutation path. rows_matched (ALL matched target rows, whatever
  * their clause outcome) and rows_inserted ride the replacement write
  * as observed metrics — no separate count jobs. Shuffles only the
  * matched rows; AQE broadcasts a small source. */
case class GraftMergeCommand(path: String, sourcePlan: LogicalPlan,
    keyCols: Seq[String],
    matchedClauses: Seq[graft.operators.TableManifest.MergeMatched],
    insertClauses: Seq[graft.operators.TableManifest.MergeInsert],
    nmbsClauses: Seq[graft.operators.TableManifest.MergeBySource],
    evolve: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("rows_matched", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src =
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark, sourcePlan)
    // merged schema: a MERGE touching a late-added column reaches
    // null-padded legacy batches, matching the catalog's read surface
    val tgtSchema0 =
      GraftTableSource.tableSchema(spark, path, None, mergeSchema = true)
    // WITH SCHEMA EVOLUTION: source-only columns widen the target
    // ATOMICALLY with the merge — the widened schema rides the
    // replacement batch's parquet footer under mergeWhere's single
    // marker (widenSchema), so a refused duplicate-key MERGE, a
    // constraint failure, or a lost-race abort leaves NO schema change
    // behind (a separate pre-merge widening commit would survive all
    // three). Re-checked against the CURRENT schema (a column may have
    // appeared since analysis) and against the rename history (an era
    // name must not resurrect old bytes).
    val missing = evolve.filterNot { case (n, _) =>
      tgtSchema0.fieldNames.exists(_.equalsIgnoreCase(n)) }
    val tgtSchema =
      if (missing.isEmpty) tgtSchema0
      else {
        val historical = TableManifest.columnMapOf(spark, path)
          .flatMap(m => m.logical +: m.physical)
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        missing.foreach { case (n, _) =>
          require(!historical.contains(
            n.toLowerCase(java.util.Locale.ROOT)),
            s"MERGE WITH SCHEMA EVOLUTION would add '$n', a " +
              s"historical name of a renamed/dropped column of $path " +
              "— run maintain (compaction) to clear the mapping first")
        }
        missing.foldLeft(tgtSchema0) { case (sch, (n, t)) =>
          sch.add(n, t, nullable = true) }
      }
    val (v, nMatched, nInserted) = TableManifest.mergeWhere(spark, path,
      src, keyCols, matchedClauses, insertClauses, nmbsClauses,
      Some(tgtSchema), widenSchema = missing.nonEmpty)
    Seq(Row(v, nMatched, nInserted))
  }
}

/** Shared NOT-NULL constraint mutation — the engine half of
  * `ALTER TABLE ... ALTER COLUMN c SET/DROP NOT NULL`, reachable from
  * both [[GraftCatalog.alterTable]] (the DROP side arrives there
  * normally) and [[GraftSetNotNullRule]] (the SET side, which Spark's
  * CheckAnalysis would otherwise refuse on any v2 table reporting the
  * column nullable — i.e. always, since parquet schemas are nullable).
  * SET validates existing data first (one pruned scan, null-padded
  * evolution rows count) and registers a kind-tagged
  * [[TableManifest.TableConstraint]] enforced on every write funnel. */
private[sources] object GraftNotNull {

  def set(spark: SparkSession, path: String, column: String): Unit = {
    val schema = GraftTableSource.tableSchema(spark, path, None,
      mergeSchema = true)
    val actual = schema.fieldNames.find(_.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$column' in graft table $path " +
          s"(have: ${schema.fieldNames.mkString(", ")})"))
    def nullRows(): Long =
      TableManifest.read(spark, path, None, mergeSchema = true)
        .filter(col(s"`$actual`").isNull).limit(1).count()
    require(nullRows() == 0L,
      s"cannot SET NOT NULL on $path.$actual — existing rows hold NULL " +
        "(null-padded evolution rows count too); backfill them first")
    val committed = retryDdl(spark, path) { cur =>
      if (cur.exists(_.notNullColumn.exists(_.equalsIgnoreCase(actual))))
        None // already NOT NULL: idempotent
      else {
        val name = s"${actual}_not_null"
        require(!cur.exists(_.name.equalsIgnoreCase(name)),
          s"constraint '$name' already exists on graft table $path")
        Some(cur :+ TableManifest.TableConstraint(name,
          s"`$actual` IS NOT NULL", enforced = true, rely = false,
          status = "VALID", kind = s"notnull:$actual"))
      }
    }
    // re-verify AFTER the constraint is in force (the tag-placement
    // pattern): a concurrent writer committing NULL-bearing rows
    // between the validation scan above and the constraint commit
    // would leave an enforced NOT NULL over already-violating rows —
    // later rewrites touching those key groups would fail enforcement
    // on rows the user never wrote. From the commit instant every NEW
    // write is gated, so a clean re-scan proves the invariant; a dirty
    // one rolls the constraint back and fails loudly.
    if (committed && nullRows() > 0L) {
      drop(spark, path, actual)
      throw new IllegalStateException(
        s"SET NOT NULL on $path.$actual raced a writer that committed " +
          "NULL-bearing rows — the constraint was rolled back; backfill " +
          "the NULLs and retry")
    }
  }

  def drop(spark: SparkSession, path: String, column: String): Unit = {
    retryDdl(spark, path) { cur =>
      val (hit, kept) = cur.partition(
        _.notNullColumn.exists(_.equalsIgnoreCase(column)))
      if (hit.isEmpty) None else Some(kept)
    }
    ()
  }

  /** The optimistic read-modify-write loop constraint DDL uses
    * ([[GraftCatalog.retryConstraintDdl]]'s shape, duplicated here so
    * the rule does not need a catalog instance). Returns true when a
    * constraint commit landed, false on the idempotent no-change path. */
  private def retryDdl(spark: SparkSession, path: String)(
      derive: Seq[TableManifest.TableConstraint]
        => Option[Seq[TableManifest.TableConstraint]]): Boolean = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 10,
        s"NOT NULL DDL on $path lost the commit race $attempt times — " +
          "retry under quieter DDL traffic")
      val v0 = TableManifest.versions(spark, path).last
      val next = derive(TableManifest.constraintsOf(spark, path, Some(v0)))
      if (next.isEmpty) return false
      try {
        TableManifest.setConstraints(spark, path, next.get, Some(v0))
        return true
      } catch {
        case _: java.util.ConcurrentModificationException => // re-derive
      }
    }
    false // unreachable
  }
}

/** `ALTER TABLE t ALTER COLUMN c SET NOT NULL` on a graft table.
  * Spark's CheckAnalysis refuses nullable-to-non-nullable on ANY v2
  * table (it cannot validate the data), and a parquet-backed table
  * always reports nullable — so the command would never reach the
  * catalog. This post-hoc rule intercepts the resolved [[AlterColumns]]
  * plan when EVERY spec is a pure SET NOT NULL on a graft table and
  * plants a command that validates the data and registers the
  * kind-tagged constraint; everything else (DROP NOT NULL, comments,
  * types) flows to the catalog unchanged. */
object GraftSetNotNullRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.ResolvedTable
  import org.apache.spark.sql.catalyst.plans.logical.AlterColumns

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case AlterColumns(rt: ResolvedTable, specs)
          if rt.table.isInstanceOf[GraftTable] &&
            specs.nonEmpty && specs.forall(s =>
              s.newNullability.contains(false) &&
                s.newDataType.isEmpty && s.newComment.isEmpty &&
                s.newPosition.isEmpty &&
                s.newDefaultExpression.isEmpty) =>
        specs.foreach(s => require(s.column.name.length == 1,
          "graft SET NOT NULL is top-level only"))
        GraftSetNotNullCommand(
          rt.table.asInstanceOf[GraftTable].tablePath,
          specs.map(_.column.name.head))
    }
}

/** The planted SET NOT NULL: validate + one constraint-artifact commit
  * per column (no rows returned, like ALTER). */
case class GraftSetNotNullCommand(path: String, columns: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    columns.foreach(GraftNotNull.set(spark, path, _))
    Nil
  }
}
