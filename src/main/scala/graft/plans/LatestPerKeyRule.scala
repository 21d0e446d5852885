package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the window-form "latest per key"
  *
  * {{{ Filter(rn = 1, Window(row_number over (PARTITION BY k ORDER BY o DESC))) }}}
  *
  * into the single-shuffle aggregate form
  *
  * {{{ Project(unpack, Aggregate(k, max_by(struct(payload), struct(o)))) }}}
  *
  * Users write the row_number idiom because it is the SQL-textbook form;
  * the aggregate form is what scales (SCALE.md "Latest-per-key"): map-side
  * partial max_by means one row per (key × map task) crosses the shuffle
  * and nothing ever sorts. Spark's own InferWindowGroupLimit bounds the
  * rows entering the window to rank ≤ 1 per partition, but still plans
  * shuffle + per-partition SORT + window; this rewrite removes the sort
  * and window machinery entirely.
  *
  * Fires only when the rewrite is provably semantics-preserving:
  *  - single row_number window expression, default RowFrame, filtered to
  *    exactly rank 1 (`rn = 1` or `rn <= 1`, either operand order;
  *    extra AND-conjuncts are kept as a residual Filter)
  *  - all sort keys share one direction with DEFAULT null ordering
  *    (DESC NULLS LAST ↔ max_by, ASC NULLS FIRST ↔ min_by — struct
  *    ordering ranks null fields smallest, which matches exactly these
  *    two defaults)
  *  - deterministic, orderable sort keys
  * Ties on the full sort key pick one arbitrary row in both forms (the
  * window's order among equal keys is unspecified, as is max_by's).
  *
  * Output attributes keep the original exprIds (payload re-exposed via
  * struct fields, the rank column as literal 1), so parent plans resolve
  * unchanged.
  */
object LatestPerKeyRule extends Rule[LogicalPlan] {

  private def rankEq1(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case EqualTo(IntegerLiteral(1), a: Attribute) => a.exprId == rn.exprId
    case LessThanOrEqual(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case GreaterThanOrEqual(IntegerLiteral(1), a: Attribute) => a.exprId == rn.exprId
    case _ => false
  }

  /** All-descending-default or all-ascending-default; None = mixed/custom. */
  private def direction(os: Seq[SortOrder]): Option[Boolean] =
    if (os.forall(o => o.direction == Descending && o.nullOrdering == NullsLast))
      Some(true)
    else if (os.forall(o => o.direction == Ascending && o.nullOrdering == NullsFirst))
      Some(false)
    else None

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      val conjuncts = split(cond)
      (w.windowExpressions, stripGroupLimit(w.child)) match {
        case (Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(ps, os, SpecifiedWindowFrame(RowFrame,
              UnboundedPreceding, CurrentRow))), _)), child)
          if os.nonEmpty &&
            conjuncts.exists(rankEq1(_, alias.toAttribute)) &&
            os.forall(o => o.child.deterministic &&
              RowOrdering.isOrderable(o.child.dataType)) &&
            ps.forall(_.deterministic) &&
            direction(os).isDefined =>

          val payload = child.output
          val pickStruct = CreateStruct(payload)
          val keyStruct = CreateStruct(os.map(_.child))
          val agg = (if (direction(os).get) MaxBy(pickStruct, keyStruct)
                     else MinBy(pickStruct, keyStruct)).toAggregateExpression()
          val picked = Alias(agg, "__latest")()
          val aggregate = Aggregate(ps, Seq(picked), child)
          val unpacked = payload.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(picked.toAttribute, i, Some(a.name)),
              a.name)(exprId = a.exprId)
          } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
          val rewritten = Project(unpacked, aggregate)

          val residual = conjuncts.filterNot(rankEq1(_, alias.toAttribute))
          if (residual.isEmpty) rewritten
          else Filter(residual.reduce(And), rewritten)

        case _ => f
      }
  }

  /** InferWindowGroupLimit may already sit under the Window when this rule
    * runs late (spark.experimental.extraOptimizations); the limit's
    * pre-filtering is subsumed by the aggregate, so look through it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case g: WindowGroupLimit => g.child
    case other => other
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case _ => None
    }
  }
}
