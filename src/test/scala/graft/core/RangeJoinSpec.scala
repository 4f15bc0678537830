package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed interval join: exact agreement with the naive nested-loop
  * result (overlaps, boundaries, empty intervals) and a plan with no
  * cartesian/nested-loop node.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // overlapping windows, a boundary-touching window, an inverted (empty)
  // window, and one spanning many buckets
  private def intervals = Seq(
    (1L, 100L, 250L),   // covers 100..249
    (2L, 200L, 300L),   // overlaps interval 1 on 200..249
    (3L, 250L, 251L),   // single unit
    (4L, 400L, 400L),   // empty: end == start
    (5L, 500L, 450L),   // inverted: must match nothing
    (6L, 0L, 1000L)     // spans every bucket
  ).toDF("iv_id", "ws", "we")

  private def points = Seq(
    (10L, 99L), (11L, 100L), (12L, 249L), (13L, 250L),
    (14L, 299L), (15L, 300L), (16L, 400L), (17L, 475L), (18L, 999L)
  ).toDF("pt_id", "p")

  test("matches the naive range join exactly, across bucket widths") {
    val naive = intervals.filter(col("we") > col("ws"))
      .crossJoin(points)
      .filter(col("p") >= col("ws") && col("p") < col("we"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (bucket <- Seq(1L, 7L, 100L, 1000L, 10000L)) {
      val got = RangeJoin.intervalJoin(intervals, "ws", "we", points, "p", bucket)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toList
      assert(got.size == got.toSet.size, s"duplicate pairs at bucket=$bucket")
      assert(got.toSet == naive, s"mismatch at bucket=$bucket")
    }
  }

  test("end-exclusive boundaries and empty intervals") {
    val got = RangeJoin.intervalJoin(intervals, "ws", "we", points, "p", 50L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 11L)))   // p == ws is IN
    assert(!got.contains((1L, 13L)))  // p == we is OUT
    assert(got.contains((3L, 13L)))   // single-unit window holds its start
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 5L)) // empty/inverted
  }

  test("plans an equi-join on the bucket id, never a nested loop") {
    val plan = RangeJoin
      .intervalJoin(intervals, "ws", "we", points, "p", 50L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }
}
