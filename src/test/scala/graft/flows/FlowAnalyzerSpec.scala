package graft.flows

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-driven tests for the flow-analytics operators, asserting the
  * reference's pandas edge semantics (FIXTURES F2-F4): SUCCEEDED filter,
  * duration clamping, the timing skip-list, per-step completion-field
  * dispatch, first-seen pivot ordering, and the transitions event-pair math.
  */
class FlowAnalyzerSpec extends SparkSpec {

  private def t(sec: Int): String = f"2023-10-01T00:${sec / 60}%02d:${sec % 60}%02d+00:00"

  private lazy val session = spark
  import session.implicits._

  // -- F2 fixture: 3 runs; one FAILED (filtered), one with a negative
  //    Transfer interval (clamped to 0). Steps per run: Transfer (request/
  //    completion in details), Analysis (plain), Publishv2Ingest (skipped),
  //    plus the "input" key (skipped).
  private def run(id: String, status: String, t0: Int, t1: Int,
      transferReq: Int, transferDone: Int): FlowRun = FlowRun(
    run_id = id, action_id = s"a_$id", flow_id = "f1", status = status,
    start_time = t(t0), completion_time = t(t1),
    output = Map(
      "input" -> StepOutput(s"a_$id", "input", "OK", t(t0), t(t0)),
      "Transfer" -> StepOutput(s"a_$id", "Transfer", "OK", t(t0), t(t0 + 12),
        StepDetails(bytes_transferred = Some(100L * 1024 * 1024),
          request_time = Some(t(transferReq)), completion_time = Some(t(transferDone)))),
      "Analysis" -> StepOutput(s"a_$id", "Analysis", "OK", t(t0 + 12), t(t0 + 20)),
      "Publish" -> StepOutput(s"a_$id", "Publishv2Ingest", "OK", t(t0 + 20), t(t0 + 25),
        StepDetails(index_id = Some("idx"),
          creation_date = Some(t(t0 + 20)), completion_date = Some(t(t0 + 24))))))

  private lazy val runs = Seq(
    run("r1", "SUCCEEDED", 0, 60, 0, 10),      // Active = 10 + 8 = 18, Total = 60
    run("r2", "SUCCEEDED", 100, 130, 120, 110), // negative Transfer → clamp 0; Active = 8
    run("r3", "FAILED", 200, 260, 200, 210)     // filtered out
  ).toDF()

  test("timingData: SUCCEEDED filter, skip-list, dispatch, clamping") {
    val out = FlowAnalyzer.timingData(runs).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("r1", "r2"))
    val r1 = out(0); val r2 = out(1)
    // r1: Transfer via request→completion (10s) + Analysis via step times (8s)
    assert(r1.getDouble(1) == 18.0 && r1.getDouble(3) == 60.0)
    assert(r1.getDouble(2) == 42.0) // Overhead = 60 − 18
    // r2: Transfer interval negative → clamped to 0; Analysis 8s
    assert(r2.getDouble(1) == 8.0 && r2.getDouble(3) == 30.0)
  }

  test("describeUsage: bytes in GB + funcX step time") {
    val u = FlowAnalyzer.describeUsage(runs, fxSteps = Set("Analysis")).collect()(0)
    val gb = 100.0 * 1024 * 1024 / (1024.0 * 1024 * 1024)
    assert(math.abs(u.getAs[Double]("total_gb") - 2 * gb) < 1e-12)
    assert(math.abs(u.getAs[Double]("mean_gb") - gb) < 1e-12)
    assert(u.getAs[Double]("total_funcx_sec") == 16.0) // 8s × 2 runs
  }

  // -- F3 fixture: out-of-name-order steps; pivot must keep first-seen order.
  private lazy val log = Seq(
    LogEntry("r1", 0, "ActionStarted", t(0), "Zeta"),
    LogEntry("r1", 1, "ActionCompleted", t(5), "Zeta"),
    LogEntry("r1", 2, "ActionStarted", t(5), "Alpha"),
    LogEntry("r1", 3, "FlowSucceeded", t(9), "Alpha"), // non-action code ignored
    LogEntry("r1", 4, "ActionCompleted", t(9), "Alpha"),
    LogEntry("r2", 0, "ActionStarted", t(10), "Zeta"),
    LogEntry("r2", 1, "ActionCompleted", t(12), "Zeta")
  ).toDF()

  test("pivotActionLog: wide layout, first-seen step order, runtimes") {
    val wide = FlowAnalyzer.pivotActionLog(log)
    val cols = wide.columns.toSeq
    // Zeta seen before Alpha → its column group comes first
    assert(cols.indexOf("Zeta_start") < cols.indexOf("Alpha_start"))
    val r1 = wide.filter(col("run_id") === "r1").collect()(0)
    assert(r1.getAs[Double]("Zeta_runtime") == 5.0)
    assert(r1.getAs[Double]("Alpha_runtime") == 4.0)
    assert(r1.getAs[Double]("flow_runtime") == 9.0)
    val r2 = wide.filter(col("run_id") === "r2").collect()(0)
    assert(r2.getAs[Any]("Alpha_start") == null) // step absent for r2
  }

  test("relativize + tailK") {
    val wide = FlowAnalyzer.pivotActionLog(log)
    val rel = FlowAnalyzer.relativize(wide)
    assert(rel.agg(min(col("start"))).collect()(0).getDouble(0) == 0.0)
    val last = FlowAnalyzer.tailK(wide, 1).collect()
    assert(last.length == 1 && last(0).getString(0) == "r2")
  }

  test("describeRuntimes: one row per metric") {
    val d = FlowAnalyzer.describeRuntimes(FlowAnalyzer.pivotActionLog(log)).collect()
    val zeta = d.find(_.getString(0) == "Zeta_runtime").get
    assert(zeta.getLong(1) == 2 && zeta.getAs[Double]("mean") == 3.5)
    val flow = d.find(_.getString(0) == "flow_runtime").get
    assert(flow.getAs[Double]("max") == 9.0)
  }

  // Step names come from log DATA and become derived column names. A name
  // with an apostrophe crashed the old stack() SQL string; a dotted name
  // parsed as nested-field access in the runtime fold. Pin: the pivot →
  // describe path works end to end on hostile step names.
  test("data-borne step names with quotes and dots survive the pivot and describe") {
    val hostile = Seq(
      LogEntry("r1", 0, "ActionStarted", t(0), "Bob's step"),
      LogEntry("r1", 1, "ActionCompleted", t(7), "Bob's step"),
      LogEntry("r1", 2, "ActionStarted", t(7), "publish.v2"),
      LogEntry("r1", 3, "ActionCompleted", t(10), "publish.v2")
    ).toDF()
    val wide = FlowAnalyzer.pivotActionLog(hostile)
    val r1 = wide.collect()(0)
    assert(r1.getAs[Double]("Bob's step_runtime") == 7.0)
    assert(r1.getAs[Double]("publish.v2_runtime") == 3.0)
    val d = FlowAnalyzer.describeRuntimes(wide).collect()
    assert(d.find(_.getString(0) == "Bob's step_runtime").get.getAs[Double]("max") == 7.0)
    assert(d.find(_.getString(0) == "publish.v2_runtime").get.getAs[Double]("max") == 3.0)
  }

  // -- F4 fixture: transitions with a duplicate PK row (must dedup) and a
  //    foreign task group (must filter, with tg_ prefix strip).
  private lazy val transitions = Seq(
    Transition("tA", "received", 1000000000L, task_group_uuid = "g1"),
    Transition("tA", "execution-start", 3000000000L, task_group_uuid = "g1"),
    Transition("tA", "execution-start", 3000000000L, task_group_uuid = "g1"), // dup PK
    Transition("tA", "execution-end", 8000000000L, task_group_uuid = "g1"),
    Transition("tA", "result-received", 9000000000L, task_group_uuid = "g1"),
    Transition("tB", "received", 0L, task_group_uuid = "g2"),
    Transition("tB", "execution-start", 1000000000L, task_group_uuid = "g2"),
    Transition("tB", "execution-end", 2000000000L, task_group_uuid = "g2"),
    Transition("tB", "result-received", 4000000000L, task_group_uuid = "g2")
  ).toDF()

  test("taskTimes: PK dedup, tg_ strip, event-pair seconds") {
    val g1 = FlowAnalyzer.taskTimes(transitions, Some("tg_g1")).collect()
    assert(g1.length == 1)
    assert(g1(0).getAs[Double]("exec_sec") == 5.0)
    assert(g1(0).getAs[Double]("total_sec") == 8.0)
    val all = FlowAnalyzer.taskTimes(transitions).collect()
    assert(all.length == 2)
  }

  test("readRuns: schema-first JSON ingest feeds timingData identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-flows")
    runs.coalesce(1).write.json(dir.resolve("runs").toString)
    val fromJson = FlowAnalyzer.readRuns(spark, dir.resolve("runs").toString)
    val a = FlowAnalyzer.timingData(fromJson).collect().map(_.toString).sorted.toSeq
    val b = FlowAnalyzer.timingData(runs).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("usageColumns + wideTable: full reference column set and values") {
    // action log matching the F2 runs fixture: Transfer then Analysis
    val runLog = Seq(
      LogEntry("r1", 0, "ActionStarted", t(0), "Transfer"),
      LogEntry("r1", 1, "ActionCompleted", t(12), "Transfer"),
      LogEntry("r1", 2, "ActionStarted", t(12), "Analysis"),
      LogEntry("r1", 3, "ActionCompleted", t(20), "Analysis"),
      LogEntry("r2", 0, "ActionStarted", t(100), "Transfer"),
      LogEntry("r2", 1, "ActionCompleted", t(112), "Transfer"),
      LogEntry("r2", 2, "ActionStarted", t(112), "Analysis"),
      LogEntry("r2", 3, "ActionCompleted", t(121), "Analysis"),
      // r3 is FAILED in the runs fixture: pivot row must not survive the join
      LogEntry("r3", 0, "ActionStarted", t(200), "Transfer"),
      LogEntry("r3", 1, "ActionCompleted", t(210), "Transfer")
    ).toDF()

    val wide = FlowAnalyzer.wideTable(runs, runLog, fxSteps = Set("Analysis"))
    val cols = wide.columns.toSeq
    // the reference's per-run usage column set (flow_analyzer.py:232-319)
    for (c <- Seq("Transfer_bytes_transferred", "total_bytes_transferred",
        "Transfer_action_time", "Publish_action_time", "funcx_task_ids",
        "total_funcx_time", "Transfer_runtime", "Analysis_runtime",
        "flow_runtime", "action_id"))
      assert(cols.contains(c), s"missing column $c")

    val rows = wide.orderBy("run_id").collect()
    assert(rows.map(_.getAs[String]("run_id")).toSeq == Seq("r1", "r2"))
    val r1 = rows(0); val r2 = rows(1)
    assert(r1.getAs[Long]("Transfer_bytes_transferred") == 100L * 1024 * 1024)
    assert(r1.getAs[Long]("total_bytes_transferred") == 100L * 1024 * 1024)
    assert(r1.getAs[Double]("Transfer_action_time") == 10.0)   // req 0 → done 10
    assert(r2.getAs[Double]("Transfer_action_time") == -10.0)  // raw, unclamped
    assert(r1.getAs[Double]("Publish_action_time") == 4.0)     // creation→completion
    assert(r1.getAs[scala.collection.Seq[String]]("funcx_task_ids").toSeq == Seq("a_r1"))
    assert(r1.getAs[Double]("total_funcx_time") == 8.0)        // Analysis_runtime
    assert(r2.getAs[Double]("total_funcx_time") == 9.0)
  }

  test("epochSeconds: tz strip matches naive-UTC semantics") {
    val df = Seq("2023-10-01T00:00:10+00:00", "2023-10-01T00:00:10Z",
      "2023-10-01T00:00:10.5+00:00").toDF("s")
      .select(FlowAnalyzer.epochSeconds(col("s")).as("e"))
    val es = df.collect().map(_.getDouble(0))
    assert(es(0) == es(1) && es(2) - es(0) == 0.5)
  }
}
