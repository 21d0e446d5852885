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

/** Analyzer-native SQL `MERGE INTO` on graft tables:
  *
  * {{{
  *   MERGE INTO graft.t AS t USING src AS s ON t.k = s.k [AND ...]
  *   [WHEN MATCHED [AND cond] THEN UPDATE SET * | DELETE] ...
  *   [WHEN NOT MATCHED [AND cond] THEN INSERT *] ...
  *   [WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE] ...
  * }}}
  *
  * Registered post-hoc by [[graft.GraftExtensions]]. Star-shaped
  * actions only (`UPDATE SET *` / `INSERT *` / `DELETE`), but clause
  * CONDITIONS are free expressions over both sides, rendered with the
  * [[GraftUpdateRule]] discipline (deterministic, no subqueries,
  * timestamp literals zone-independent) and first-match-wins SQL
  * semantics: a matched target row takes the first matched clause whose
  * condition holds (UPDATE SET * replaces it with its source row,
  * DELETE drops it, none holding passes it through); an unmatched
  * source row inserts when any not-matched clause accepts it; an
  * unmatched target row drops when any not-matched-by-source clause
  * accepts it. Custom assignments stay refused at analysis with the
  * library route (`TableManifest.mergeInto`) named. Other exact-SQL
  * semantics: target-side multiplicity is preserved (two target rows on
  * one key both take the clause), null keys never match (the 3VL join
  * rule), a source key matching several SOURCE rows is the standard
  * cardinality violation refused at run time before anything commits,
  * and the ON clause must pair SAME-NAMED target/source columns — a
  * cross-named key (`ON t.id = s.src_id`) is refused rather than
  * silently joined on the wrong source column — the star actions map
  * by NAME, so their contract already requires the names to line
  * up. */
object GraftMergeRule extends Rule[LogicalPlan] {
  import GraftUpdateRule.graftTableOf

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
            require(!m.withSchemaEvolution,
              "graft MERGE does not support WITH SCHEMA EVOLUTION — " +
                "evolve via an explicit different-arity append instead")
            val tgtOut = m.targetTable.outputSet
            val srcOut = m.sourceTable.outputSet
            val tgtNames = m.targetTable.output.map(_.name.toLowerCase)

            def resolveExpr(e: Expression): Expression = e.transformUp {
              case u: UnresolvedAttribute =>
                m.targetTable.resolve(u.nameParts, conf.resolver)
                  .orElse(m.sourceTable.resolve(u.nameParts,
                    conf.resolver))
                  .getOrElse(throw new IllegalArgumentException(
                    s"MERGE references unknown column ${u.sql}"))
            }
            // clause condition → SQL over the __t/__s-aliased frames
            def renderCond(raw: Expression): String = {
              val e = resolveExpr(raw)
              require(e.deterministic,
                s"non-deterministic MERGE condition: ${e.sql}")
              require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
                s"subquery in MERGE condition is not supported: ${e.sql}")
              e.transform {
                case a: AttributeReference if tgtOut.contains(a) =>
                  a.withQualifier(Seq("__t"))
                case a: AttributeReference if srcOut.contains(a) =>
                  // source rows evaluate over the target-ALIGNED frame,
                  // which carries the target's columns only
                  require(tgtNames.contains(a.name.toLowerCase),
                    s"MERGE condition references source column " +
                      s"${a.name} outside the target schema — star " +
                      "actions align by target name, so only " +
                      "target-named source columns are addressable")
                  a.withQualifier(Seq("__s"))
                case org.apache.spark.sql.catalyst.expressions.Literal(
                    v: Long, org.apache.spark.sql.types.TimestampType) =>
                  org.apache.spark.sql.catalyst.expressions
                    .MicrosToTimestamp(
                      org.apache.spark.sql.catalyst.expressions.Literal(v))
              }.sql
            }

            val matchedClauses = m.matchedActions.map {
              case UpdateStarAction(c) => ("update", c.map(renderCond))
              case DeleteAction(c)     => ("delete", c.map(renderCond))
              case other => throw new IllegalArgumentException(
                "graft MERGE matched actions are UPDATE SET * or " +
                  s"DELETE (conditions allowed), got: $other — use " +
                  "TableManifest.mergeInto for custom assignments")
            }
            val insertClauses = m.notMatchedActions.map {
              case InsertStarAction(c) => c.map(renderCond)
              case other => throw new IllegalArgumentException(
                "graft MERGE not-matched actions are INSERT * " +
                  s"(conditions allowed), got: $other")
            }
            val nmbsClauses = m.notMatchedBySourceActions.map {
              case DeleteAction(c) => c.map(renderCond)
              case other => throw new IllegalArgumentException(
                "graft MERGE not-matched-by-source actions are DELETE " +
                  s"(conditions allowed), got: $other")
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
                  s"(${ta.name} = ${sa.name}); star actions map by " +
                  "NAME, so rename the source key to the target's")
              ta.name
            }
            GraftMergeCommand(t.tablePath, m.sourceTable, keys,
              matchedClauses, insertClauses, nmbsClauses)
          case None => m
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** The planted merge command: one CoW snapshot commit of
  * `kept ∪ matched ∪ inserted` through the pinned re-derive loop
  * ([[TableManifest.commitDerivedSnapshot]]), so an append racing the
  * merge is folded by a retry, never lost.
  *
  *  - kept: target rows with no source key match (anti join), minus
  *    those a not-matched-by-source DELETE clause accepts;
  *  - matched: the inner join, each row resolved first-match-wins —
  *    the first accepting UPDATE clause takes the SOURCE row (one per
  *    matched TARGET row: multiplicity preserved), the first accepting
  *    DELETE clause drops it, no accepting clause passes the TARGET row
  *    through;
  *  - inserted: source rows with no target match that any INSERT clause
  *    accepts.
  *
  * rows_matched (ALL matched target rows, whatever their clause
  * outcome) and rows_inserted ride the write pass as observed metrics —
  * no separate count jobs. Shuffles on the merge keys; AQE broadcasts a
  * small source. */
case class GraftMergeCommand(path: String, sourcePlan: LogicalPlan,
    keyCols: Seq[String],
    matchedClauses: Seq[(String, Option[String])] =
      Seq(("update", None)),
    insertClauses: Seq[Option[String]] = Seq(None),
    nmbsClauses: Seq[Option[String]] = Nil)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("rows_matched", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())

  // a clause condition as a 3VL-safe Column (absent = always accepts)
  private def accepts(c: Option[Option[String]]): org.apache.spark.sql
      .Column = c match {
    case Some(Some(sql)) =>
      org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.expr(sql), lit(false))
    case _ => lit(true)
  }

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
    var updObs: org.apache.spark.sql.Observation = null
    var insObs: org.apache.spark.sql.Observation = null
    val v = TableManifest.commitDerivedSnapshot(spark, path, { v0 =>
      val tgt = TableManifest.readAt(spark, path, v0, Some(tgtSchema))
      updObs = new org.apache.spark.sql.Observation()
      insObs = new org.apache.spark.sql.Observation()
      // kept: unmatched target rows, minus NOT MATCHED BY SOURCE deletes
      val kept0 = tgt.join(aligned.select(keyCols.map(col): _*),
        keyCols, "left_anti")
      val kept =
        if (nmbsClauses.isEmpty) kept0
        else kept0.alias("__t").filter(
          !nmbsClauses.map(c => accepts(Some(c))).reduce(_ || _))
      // matched: first-match-wins over the inner join; the observation
      // sits UPSTREAM of the clause filter so rows_matched counts every
      // matched target row, whatever its clause outcome
      val matched =
        if (matchedClauses.isEmpty)
          tgt.join(aligned.select(keyCols.map(col): _*),
              keyCols, "left_semi")
            .observe(updObs, count(lit(1)).as("n"))
        else {
          val joined = tgt.alias("__t").join(aligned.alias("__s"),
              keyCols.map(k =>
                col(s"__t.`$k`") === col(s"__s.`$k`")).reduce(_ && _),
              "inner")
            .observe(updObs, count(lit(1)).as("n"))
          val tRow = org.apache.spark.sql.functions.struct(
            tgtSchema.fields.map(f =>
              col(s"__t.`${f.name}`").as(f.name)).toIndexedSeq: _*)
          val sRow = org.apache.spark.sql.functions.struct(
            tgtSchema.fields.map(f =>
              col(s"__s.`${f.name}`").as(f.name)).toIndexedSeq: _*)
          val act = matchedClauses.zipWithIndex.foldRight(
              lit(-1): org.apache.spark.sql.Column) {
            case (((_, c), i), els) =>
              org.apache.spark.sql.functions
                .when(accepts(Some(c)), lit(i)).otherwise(els)
          }
          val delIdx = matchedClauses.zipWithIndex.collect {
            case (("delete", _), i) => i }
          val updIdx = matchedClauses.zipWithIndex.collect {
            case (("update", _), i) => i }
          val staged = joined.withColumn("__act", act)
          val survivors =
            if (delIdx.isEmpty) staged
            else staged.filter(!col("__act")
              .isin(delIdx.map(Int.box): _*))
          val isUpd =
            if (updIdx.isEmpty) lit(false)
            else col("__act").isin(updIdx.map(Int.box): _*)
          survivors.withColumn("__row",
              org.apache.spark.sql.functions.when(isUpd, sRow)
                .otherwise(tRow))
            .select(col("__row.*"))
        }
      // inserted: unmatched source rows any INSERT clause accepts
      // (filter-before-anti-join commutes with the key anti join)
      val inserted =
        if (insertClauses.isEmpty) aligned.limit(0)
        else aligned.alias("__s")
          .filter(insertClauses.map(c => accepts(Some(c)))
            .reduce(_ || _))
          .join(tgt.select(keyCols.map(col): _*), keyCols, "left_anti")
      kept.unionByName(matched)
        .unionByName(inserted.observe(insObs, count(lit(1)).as("n")))
    })
    // a statically-empty branch is pruned by PropagateEmptyRelation
    // WITH its CollectMetrics node, so its observation reports an empty
    // map. For inserts that means exactly zero rows landed. For the
    // matched side it means the clause chain constant-folded to
    // all-delete (an unconditional DELETE heads the list), which empties
    // the branch without running the join — rows_matched then falls back
    // to a keys-only semi count against the PINNED pre-merge version
    // (v - 1: commitDerivedSnapshot commits at pin + 1), audit-only.
    def metricOpt(o: org.apache.spark.sql.Observation): Option[Long] =
      o.get.get("n").map(_.asInstanceOf[Long])
    val nMatched = metricOpt(updObs).getOrElse {
      TableManifest.readAt(spark, path, v - 1, Some(tgtSchema))
        .select(keyCols.map(col): _*)
        .join(aligned.select(keyCols.map(col): _*), keyCols, "left_semi")
        .count()
    }
    Seq(Row(v, nMatched, metricOpt(insObs).getOrElse(0L)))
  }
}
