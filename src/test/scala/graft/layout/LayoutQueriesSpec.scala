package graft.layout

import graft.SparkSpec

/** Layout-operator pins: the 100 TB claims each query's scaladoc makes,
  * asserted on actual plans/results at sf0.001.
  */
class LayoutQueriesSpec extends SparkSpec {

  test("b1: co-bucketed join plans with no exchange on either leg") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val join = LayoutQueries.bucketedJoin(spark, sf)
      val plan = join.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), plan.take(400))
      assert(!plan.contains("Exchange"), plan.take(2000))
      // the scans really are the bucketed tables
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      // and the layout doesn't change the answer
      assert(join.count() ==
        graft.core.Tables.load(spark, sf, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("b2: the fact scan carries a dynamic partition pruning filter") {
    val df = LayoutQueries.b2PartitionPruning.fn(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      plan.linesIterator.take(40).mkString("\n"))
    // and pruning is semantically invisible: exactly the 2-month window
    val months = df.collect().map(_.getAs[String]("ship_month"))
    assert(months.nonEmpty && months.forall(m => m >= "1995-03" && m <= "1995-04"))
  }

  test("b3: epoch-range filter prunes partition DIRECTORIES via the derived day bound") {
    val df = LayoutQueries.b3TimePartitionPruning.fn(spark, sf)
    val got = df.collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toMap
    val planStr = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the injected bound reaches the scan as a partition filter
    val pf = planStr.linesIterator.find(_.trim.startsWith("PartitionFilters")).get
    assert(pf.contains("event_day"), pf)
    assert(pf.contains(">=") && pf.contains("<="), pf)
    // and it actually prunes: the store holds ~30 day directories, the
    // 2024-01-10T06:00Z..01-12T18:00Z slice touches exactly 3
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, planStr.take(1200))
    val read = scans.head.selectedPartitions.partitionCount
    val total = new java.io.File(
      LayoutQueries.ensureTimePartitioned(spark, sf))
      .listFiles().count(_.getName.startsWith("event_day="))
    assert(total >= 10, s"store has $total day partitions")
    assert(read == 3, s"read $read of $total partitions")
    // pruning is semantically invisible: same rows as the unpartitioned scan
    val expect = graft.core.Tables.load(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("ts")
        .between(1_704_866_400_000_000_000L, 1_705_082_399_999_999_999L))
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("c6: compaction bins are contiguous, disjoint doc ranges per source") {
    val rows = LayoutQueries.c6CompactionPlan.fn(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, bins) =>
      val ordered = bins.sortBy(_.getAs[Long]("bin"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
      ordered.foreach { r =>
        assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
        assert(r.getAs[Long]("bin_bytes") > 0L)
      }
    }
  }

  test("c7: scan reads only the two stats columns (pruned ReadSchema)") {
    val df = LayoutQueries.c7DataSkipping.fn(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_orderdate") && !readSchema.contains("o_custkey"))
    // pruning decision is sound: every skipped file has max below the cut
    df.collect().foreach { r =>
      if (!r.getAs[Boolean]("would_scan"))
        assert(r.getAs[Double]("mx") < 400000.0)
    }
  }

  test("z1: every Z-cluster bounds a 128x128 box in key space") {
    val rows = LayoutQueries.z1Zorder.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 64)
    rows.foreach { r =>
      val (x0, x1) = (r.getAs[Int]("x_min"), r.getAs[Int]("x_max"))
      val (y0, y1) = (r.getAs[Int]("y_min"), r.getAs[Int]("y_max"))
      // cluster = z >> 14 keeps 3 high bits per dimension: a 128-aligned box
      assert(x0 / 128 == x1 / 128, s"x box spans blocks: $x0..$x1")
      assert(y0 / 128 == y1 / 128, s"y box spans blocks: $y0..$y1")
    }
  }
}
