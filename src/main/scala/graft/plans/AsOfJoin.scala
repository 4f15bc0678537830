package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** The full custom-operator tier (SURVEY §2 H / builder tier (c)): an
  * AS-OF JOIN as a first-class plan — logical node, planner strategy and
  * a merge-based physical operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics: every RIGHT row joins the most recent LEFT row of the same
  * key with `leftTime <= rightTime` (ties on time resolved to the
  * largest `leftTie`) — purchase←last-click attribution, trade←quote,
  * reading←calibration. Spark has no physical as-of join; q16 composes
  * one from tag-union + window, which sorts the UNION of both inputs.
  * This operator instead declares hash distribution on the key and
  * (key, time) ordering per child, and then MERGES the two sorted
  * streams in one linear pass per partition: no union materialization,
  * no window state, no row tagging — each side is shuffled/sorted once
  * on its own columns and the join itself is O(n) with O(1) state (the
  * current candidate row). At 100 TB both inputs can arrive
  * pre-bucket-sorted on (key, time) and the exchanges vanish entirely —
  * the operator's requirements express exactly that to the planner,
  * which is the point of owning the plan node instead of composing.
  *
  * Exactness: key/time/tie are LongType and comparisons are integral, so
  * results are a pure function of the input set — q36 verifies the
  * operator against the same DuckDB ASOF oracle shape as q16.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, ltie, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, ltie, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Per-partition two-pointer merge of key-clustered, (key, time, tie)-
  * sorted children. LEFT-OUTER on the right side: right rows with no
  * qualifying left row emit nulls for the left columns.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression, leftTie: Expression,
    rightKey: Expression, rightTime: Expression)
    extends BinaryExecNode {

  require(Seq(leftKey, leftTime, leftTie, rightKey, rightTime)
    .forall(_.dataType == LongType), "as-of join requires BIGINT key/time/tie")

  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))

  // co-partition both children on the key; EnsureRequirements inserts
  // compatible hash exchanges (or nothing, if the data is already
  // bucketed that way)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition merge order; pre-sorted inputs skip the sort
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "right rows with a left match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lk = leftKey; val lt = leftTime
    val rk = rightKey; val rt = rightTime
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullLeft = new GenericInternalRow(leftOut.size)

      var lRow: InternalRow = null
      var lKeyV = 0L; var lTimeV = 0L
      def advanceLeft(): Unit =
        if (lIt.hasNext) {
          lRow = lIt.next()
          val k = lProj(lRow)
          lKeyV = k.getLong(0); lTimeV = k.getLong(1)
        } else lRow = null

      var candRow: InternalRow = null
      var candKey = 0L
      advanceLeft()
      rIt.map { rRow =>
        val k = rProj(rRow)
        val rKeyV = k.getLong(0); val rTimeV = k.getLong(1)
        while (lRow != null &&
            (lKeyV < rKeyV || (lKeyV == rKeyV && lTimeV <= rTimeV))) {
          if (lKeyV == rKeyV) { candRow = lRow.copy(); candKey = lKeyV }
          advanceLeft()
        }
        val matched = candRow != null && candKey == rKeyV
        if (matched) matchedRows += 1
        outRows += 1
        resultProj(joined(rRow, if (matched) candRow else nullLeft))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Library entry: right rows joined with the most recent left row per
  * key (left columns null when no left row qualifies). All three naming
  * columns must be BIGINT.
  */
object AsOf {
  def lastBefore(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String, leftTie: String,
      rightKey: String, rightTime: String): DataFrame = {
    val lp = PlanBridge.analyzed(left)
    val rp = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    PlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(lp, leftTime),
        attr(lp, leftTie), attr(rp, rightKey), attr(rp, rightTime)))
  }
}
