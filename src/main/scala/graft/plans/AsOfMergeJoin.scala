package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator Catalyst extension tier: a BACKWARD as-of join as a
  * first-class physical operator — custom logical node ([[AsOfJoinNode]]),
  * planner strategy ([[AsOfJoinStrategy]]), and sorted-merge SparkPlan
  * ([[AsOfMergeJoinExec]]) — complementing the composition-level
  * `operators.AsOfJoin` (union + window carry).
  *
  * Where the union+carry form RE-SHAPES the query so built-in operators
  * can run it, this operator instead DECLARES its physical requirements
  * and lets EnsureRequirements do the work: `requiredChildDistribution`
  * hash-clusters both sides on the key, `requiredChildOrdering` sorts
  * each side by (key, time), and `doExecute` is then a single forward
  * merge pass per partition — right rows are consumed at most once, the
  * held candidate is one row deep, so the join is O(|L| + |R|) with zero
  * per-row allocation beyond the one held copy. That is exactly the
  * merge an engine with a native ASOF JOIN runs; the shuffles/sorts that
  * feed it are planned by Spark, including AQE re-optimization.
  *
  * Semantics (= `AsOfJoin.backward`, = DuckDB `ASOF LEFT JOIN` on
  * `r.time <= l.time`): for each left row the LATEST right row with the
  * same key and right.time <= left.time; left-outer; null left key or
  * time matches nothing; null right keys/times never match. The right
  * side must be unique per (key, time) for deterministic results — same
  * contract as the composition form.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfMergeJoinExec]]. Register per session:
  * `spark.experimental.extraStrategies ++= Seq(AsOfJoinStrategy)` (done
  * lazily by [[PhysicalAsOf.backward]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, fwd) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the key: EnsureRequirements inserts
    * compatible Exchanges (and AQE may later coalesce both identically). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) ascending on both sides: EnsureRequirements inserts the
    * SortExecs; the merge below then never looks backwards. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of key/time attributes must come from the respective child")
    val nRightFields = right.output.length
    // bind against the nullability-ADJUSTED attrs (= output): binding raw
    // right.output would mark unmatched-side fields non-nullable and
    // codegen would skip the null check, reading 0 instead of null
    val allAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullRight = new GenericInternalRow(nRightFields)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, allAttrs)
      val rBuf = rIter.buffered
      // the one held candidate: latest right row (copied — iterators
      // reuse row buffers) whose (key, time) <= the current left cursor
      var held: InternalRow = null
      var heldKey: Any = null

      lIter.map { lRow =>
        val lk = lRow.get(lKeyIdx, keyType)
        val lt = lRow.get(lTimeIdx, timeType)
        if (lk == null || lt == null) proj(joined(lRow, nullRight))
        else if (forward) {
          // consume strictly-before rows; the head (if same key) is then
          // the EARLIEST right row at/after lt — peeked, not consumed,
          // because it may also match later left rows
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rBuf.head.get(rKeyIdx, keyType)
            val rt = rBuf.head.get(rTimeIdx, timeType)
            val keyCmp = if (rk == null) -1 else keyOrd.compare(rk, lk)
            if (keyCmp < 0 || (keyCmp == 0 &&
                (rt == null || timeOrd.compare(rt, lt) < 0))) rBuf.next()
            else advancing = false
          }
          val matches = rBuf.hasNext && {
            val rk = rBuf.head.get(rKeyIdx, keyType)
            rk != null && keyOrd.compare(rk, lk) == 0
          }
          proj(joined(lRow, if (matches) rBuf.head else nullRight))
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rBuf.head.get(rKeyIdx, keyType)
            val rt = rBuf.head.get(rTimeIdx, timeType)
            val keyCmp = if (rk == null) -1 else keyOrd.compare(rk, lk)
            if (keyCmp < 0 || (keyCmp == 0 &&
                (rt == null || timeOrd.compare(rt, lt) <= 0))) {
              val r = rBuf.next()
              if (keyCmp == 0 && rt != null) {
                held = r.copy()
                heldKey = held.get(rKeyIdx, keyType)
              }
            } else advancing = false
          }
          val matches = held != null && heldKey != null &&
            keyOrd.compare(heldKey, lk) == 0 &&
            timeOrd.compare(held.get(rTimeIdx, timeType), lt) <= 0
          proj(joined(lRow, if (matches) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing entry for the physical as-of join. */
object PhysicalAsOf {

  /** Latest right row at/before each left row's time, per key. Right
    * columns keep their names — rename them on the input (which also
    * mints fresh exprIds) so they never collide with left names. */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame =
    build(left, right, leftKey, leftTime, rightKey, rightTime, forward = false)

  /** Earliest right row at/after each left row's time, per key — the
    * peek-ahead merge (the matched head may serve later left rows too,
    * so it is never consumed on match). */
  def forward(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame =
    build(left, right, leftKey, leftTime, rightKey, rightTime, forward = true)

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(l, leftKey), attr(r, rightKey))
    val (lt, rt) = (attr(l, leftTime), attr(r, rightTime))
    // the merge builds its orderings from the LEFT types: a mismatch
    // must fail here, not as a ClassCastException inside executor tasks
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    GraftColumnBridge.ofRows(spark,
      AsOfJoinNode(l, r, lk, rk, lt, rt, forward))
  }
}
