package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBuilder}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** As-of join as a WHOLE custom Catalyst operator — the extension class
  * (c) of the engine's preference order: a logical node, a planner
  * `Strategy`, and a physical `SparkPlan` with real distribution/ordering
  * requirements, registered through the public
  * `experimental.extraStrategies` hook. The engine's other as-of surface
  * (`q_asof_join`) COMPOSES built-ins (union + keyed last-value window:
  * right when the semantics fit existing operators); this node is the
  * "Spark genuinely lacks the operator" path: one co-partitioned,
  * co-sorted merge walk per partition — the plan a native engine would
  * run, with NO union fan-in and no window state beyond one buffered
  * match row.
  *
  * Scale shape: EnsureRequirements hash-partitions both sides on the key
  * and sorts within partitions by (key, time) — identical wiring to a
  * sort-merge join — then [[AsOfJoinExec.doExecute]] streams both
  * iterators once. Memory per partition is ONE buffered right row;
  * skew behaves exactly like SMJ skew (AQE's skew splitter applies).
  *
  * Contract: keys and times are non-null LongType (the engine's id /
  * epoch-time columns); the right side's latest row with
  * `r.time <= l.time` for the same key joins each left row, else nulls.
  * Time ties on the right resolve to the last row in (key, time, …)
  * sort order — callers wanting total determinism pass unique times
  * (the engine's nanosecond-timestamp contract).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryNode {
  require(Seq(leftKey, leftTime, rightKey, rightTime).forall(_.dataType == LongType),
    "as-of join keys/times must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the sort-merge-join wiring: co-partition on the key, co-sort on
  // (key, time) — EnsureRequirements inserts the exchanges/sorts
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    def idx(out: Seq[Attribute], a: Attribute): Int =
      out.indexWhere(_.exprId == a.exprId)
    val (lki, lti) = (idx(left.output, leftKey), idx(left.output, leftTime))
    val (rki, rti) = (idx(right.output, rightKey), idx(right.output, rightTime))
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var rHead: InternalRow = null          // lookahead, not yet consumed
      var matchRow: InternalRow = null       // last right row ≤ current left
      var matchKey = 0L
      lIter.map { lRow =>
        val lk = lRow.getLong(lki)
        val lt = lRow.getLong(lti)
        // consume right rows that can never match a LATER left row worse
        // than they match this one: everything with key < lk, and
        // everything with key == lk and time <= lt (each supersedes the
        // previous buffered match — left times are non-decreasing per key)
        var advance = true
        while (advance && (rHead != null || rIter.hasNext)) {
          if (rHead == null) rHead = rIter.next()
          val rk = rHead.getLong(rki)
          if (rk < lk) rHead = null // behind every remaining left key
          else if (rk == lk && rHead.getLong(rti) <= lt) {
            matchRow = rHead.copy() // buffered: exactly one row
            matchKey = rk
            rHead = null
          } else advance = false // ahead of this left row; keep for later
        }
        val rSide =
          if (matchRow != null && matchKey == lk) matchRow else nullRight
        proj(joined(lRow, rSide))
      }
    }
  }
}

/** Public API for the native as-of join. Rename overlapping right-side
  * columns before calling — the node concatenates both outputs. */
object AsOfOps {
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    GraftPlanBuilder.addStrategy(spark, AsOfJoinStrategy)
    val (lp, rp) = (leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    GraftPlanBuilder.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, leftKey), attr(lp, leftTime), attr(rp, rightKey), attr(rp, rightTime)))
  }
}
