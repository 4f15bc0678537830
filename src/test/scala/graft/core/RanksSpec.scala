package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[Ranks.valueBucketed]] — exactness against the naive per-group
  * rank window, and the plan property the naive form lacks: no window
  * over ROW-LEVEL data may be partitioned by the group alone (that is a
  * per-group single-reducer sort, the q31/q41 round-3 scale flaw).
  */
class RanksSpec extends SparkSpec {

  private def naiveRanks(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("g")
    df.withColumn("rn", row_number().over(w.orderBy("v")))
      .withColumn("n", count(lit(1)).over(w))
  }

  test("ranks match the naive window incl. ties and out-of-range values") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      ("g" + (i % 3), math.floor(rnd.nextDouble() * 40) / 2.0 - 5.0)
    } // duplicates guaranteed (ties), values spill below vLo and above vHi
    val df = rows.toDF("g", "v")
    val got = Ranks.valueBucketed(df, "g", "v", buckets = 8, vLo = 0.0, vHi = 10.0)
      .select("g", "v", "rn", "n")
    val want = naiveRanks(df).select("g", "v", "rn", "n")
    // tie order within equal v may differ; the (g, rn) -> v mapping and the
    // (g, v) multiset are what rank selection consumes — compare those
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getAs[Number]("rn").longValue,
        r.getDouble(1), r.getAs[Number]("n").longValue))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(got) == canon(want))
  }

  test("every rank is assigned exactly once per group") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => ("g" + (i % 2), (i * 37 % 100).toDouble))
      .toDF("g", "v")
    val got = Ranks.valueBucketed(df, "g", "v", 4, 0.0, 100.0)
    val perGroup = got.groupBy("g")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("rn")).as("dr"),
        min(col("rn")).as("lo"), max(col("rn")).as("hi"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getAs[Long]("cnt") == r.getAs[Long]("dr"))
      assert(r.getAs[Long]("lo") == 1L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("cnt"))
    }
  }

  test("no row-level window is partitioned by the group alone (q31 plan)") {
    val df = graft.queries.RelationalQueries.q31Percentiles.fn(spark, sf)
    val plan = df.queryExecution.sparkPlan
    def hasAgg(p: SparkPlan): Boolean =
      p.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
    val offenders = plan.collect {
      // a 1-key window whose input is NOT already aggregated sorts whole
      // group slices on single reducers — the shape this operator removes
      case w: WindowExec if w.partitionSpec.length < 2 && !hasAgg(w.child) => w
    }
    assert(offenders.isEmpty,
      s"per-group single-reducer rank window in plan:\n${offenders.mkString("\n")}")
  }

  test("q47 global ranks: no ungrouped/1-key row-level window either") {
    val df = graft.queries.RelationalQueries.q47GlobalPercentiles.fn(spark, sf)
    val plan = df.queryExecution.sparkPlan
    def hasAgg(p: SparkPlan): Boolean =
      p.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
    val offenders = plan.collect {
      case w: WindowExec if w.partitionSpec.length < 2 && !hasAgg(w.child) => w
    }
    assert(offenders.isEmpty, s"single-reducer sort in global-quantile plan:\n$offenders")
  }

  test("orderStatistics equals the naive ranked interpolation, ties and all") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(700) { i =>
      ("g" + (i % 3), math.floor(rnd.nextDouble() * 40) / 2.0 - 5.0)
    } // ties guaranteed; values spill outside [vLo, vHi) on both ends
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = Ranks.orderStatistics(df, "g", "v", buckets = 8,
        vLo = 0.0, vHi = 10.0, ps = ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // naive truth: full sort per group, pos = p(n-1)+1, linear interp
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      ps.foreach { p =>
        val pos = p * (sorted.length - 1) + 1
        val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
        val want = sorted(lo - 1) +
          (sorted(hi - 1) - sorted(lo - 1)) * (pos - math.floor(pos))
        assert(got((g, p)) == want, s"($g, $p): ${got((g, p))} != $want")
      }
    }
  }

  test("bucket offsets come back over a broadcast join (no fact re-shuffle)") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => ("g", i.toDouble)).toDF("g", "v")
    val planStr = Ranks.valueBucketed(df, "g", "v", 8, 0.0, 100.0)
      .queryExecution.sparkPlan.toString
    assert(planStr.contains("BroadcastHashJoin"), planStr)
  }

  test("a NULL group is kept as its own group (window-rank semantics)") {
    import spark.implicits._
    // a plain using-join on g would drop the null-group rows entirely;
    // row_number().over(partitionBy(g)) keeps null as one group
    val df = Seq(("a", 3.0), ("a", 1.0), (null, 2.0), (null, 5.0), (null, 1.0))
      .toDF("g", "v")
    val got = Ranks.valueBucketed(df, "g", "v", 4, 0.0, 10.0)
      .select("g", "v", "rn", "n").collect()
    assert(got.length == 5, got.toSeq.toString)
    val nullGroup = got.filter(_.isNullAt(0)).map(r => (r.getDouble(1), r.getLong(2)))
    assert(nullGroup.sortBy(_._1).map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(got.filter(_.isNullAt(0)).forall(_.getLong(3) == 3L))

    val q = Ranks.orderStatistics(df, "g", "v", 4, 0.0, 10.0, Seq(0.5))
      .collect()
    assert(q.length == 2) // one row for "a", one for the null group
    val nullQ = q.filter(_.isNullAt(0))
    assert(nullQ.length == 1 && nullQ.head.getDouble(2) == 2.0)
  }

  test("orderStatistics rejects percentiles outside [0, 1] up front") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Ranks.orderStatistics(df, "g", "v", 4, 0.0, 10.0, Seq(1.01))
    }
    intercept[IllegalArgumentException] {
      Ranks.orderStatistics(df, "g", "v", 4, 0.0, 10.0, Seq(-0.01))
    }
  }
}
