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

  // the merge neither re-partitions nor re-orders: output stays clustered
  // on the right key and (rightKey, rightTime)-sorted, so a downstream
  // groupBy/join on the key reuses the exchange and sort instead of
  // inserting fresh ones (the operator's exchange-amortization thesis
  // applies above it, not just below)
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    right.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = right.outputOrdering

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

      // NULL semantics: a null key or time can never satisfy the SQL
      // comparisons the merge implements, and getLong on a null slot
      // would read 0 — a fabricated key that both produces false matches
      // and, because nulls sort FIRST, breaks the sorted-merge invariant
      // for every later genuine key. Null-keyed/timed LEFT rows are
      // skipped (they qualify for nothing); null-keyed/timed RIGHT rows
      // emit unmatched without advancing the left cursor.
      var lRow: InternalRow = null
      var lKeyV = 0L; var lTimeV = 0L
      def advanceLeft(): Unit = {
        lRow = null
        while (lRow == null && lIt.hasNext) {
          val next = lIt.next()
          val k = lProj(next)
          if (!k.isNullAt(0) && !k.isNullAt(1)) {
            lRow = next
            lKeyV = k.getLong(0); lTimeV = k.getLong(1)
          }
        }
      }

      var candRow: InternalRow = null
      var candKey = 0L
      advanceLeft()
      rIt.map { rRow =>
        val k = rProj(rRow)
        val rNull = k.isNullAt(0) || k.isNullAt(1)
        var matched = false
        if (!rNull) {
          val rKeyV = k.getLong(0); val rTimeV = k.getLong(1)
          while (lRow != null &&
              (lKeyV < rKeyV || (lKeyV == rKeyV && lTimeV <= rTimeV))) {
            if (lKeyV == rKeyV) { candRow = lRow.copy(); candKey = lKeyV }
            advanceLeft()
          }
          matched = candRow != null && candKey == rKeyV
        }
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
  * key (left columns null when no left row qualifies).
  *
  * The physical merge compares raw longs, so non-BIGINT key/time/tie
  * columns are adapted by inserting ORDER-PRESERVING, INJECTIVE casts
  * beneath the plan: integral types widen to long, TIMESTAMP becomes
  * unix_micros (the full internal precision — a cast-to-long would
  * truncate to seconds and merge sub-second ties), DATE becomes its day
  * number. The helper columns are dropped from the result, so callers
  * see exactly (right columns ++ left columns) as before.
  *
  * Inputs sharing attribute ids (both sides derived from the same
  * DataFrame without fresh aliases) are re-aliased on the right side:
  * the output projection binds by exprId, and duplicate ids would make
  * left columns silently read right-side values.
  */
object AsOf {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, ShortType, TimestampType}

  /** Ensure `n` is readable as a BIGINT: returns the frame (with a helper
    * column when a cast is needed), the column name to use, and whether a
    * helper was added.
    */
  private def asLong(df: DataFrame, n: String): (DataFrame, String) = {
    require(df.columns.contains(n),
      s"no column $n in ${df.columns.mkString(",")}")
    df.schema(n).dataType match {
      case LongType => (df, n)
      case IntegerType | ShortType | ByteType =>
        val h = s"__asof_$n"
        (df.withColumn(h, col(n).cast("long")), h)
      case TimestampType =>
        val h = s"__asof_$n"
        (df.withColumn(h, expr(s"unix_micros(`$n`)")), h)
      case DateType =>
        val h = s"__asof_$n"
        (df.withColumn(h, expr(s"unix_date(`$n`)").cast("long")), h)
      case other => throw new IllegalArgumentException(
        s"as-of column $n: unsupported type $other (need integral/timestamp/date)")
    }
  }

  def lastBefore(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String, leftTie: String,
      rightKey: String, rightTime: String): DataFrame = {
    // the result drops every __asof_-prefixed column (the cast helpers),
    // so a user column with that name would silently vanish
    (left.columns ++ right.columns).find(_.startsWith("__asof_")).foreach(c =>
      throw new IllegalArgumentException(
        s"input carries reserved as-of helper column $c"))
    val (l1, lkN) = asLong(left, leftKey)
    val (l2, ltN) = asLong(l1, leftTime)
    val (l3, ltieN) = asLong(l2, leftTie)
    val (r1, rkN) = asLong(right, rightKey)
    val (r2, rtN) = asLong(r1, rightTime)

    val lp = PlanBridge.analyzed(l3)
    val rp0 = PlanBridge.analyzed(r2)
    // fresh ids on the right when the sides overlap (same-source joins)
    val overlap = lp.output.map(_.exprId).toSet
      .intersect(rp0.output.map(_.exprId).toSet)
    val rSafe =
      if (overlap.isEmpty) r2
      else r2.select(r2.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val rp = PlanBridge.analyzed(rSafe)

    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val joined = PlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, lkN), attr(lp, ltN),
        attr(lp, ltieN), attr(rp, rkN), attr(rp, rtN)))
    val helpers = joined.columns.filter(_.startsWith("__asof_"))
    if (helpers.isEmpty) joined else joined.drop(helpers.toIndexedSeq: _*)
  }
}
