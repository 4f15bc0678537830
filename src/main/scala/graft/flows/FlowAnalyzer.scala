package graft.flows

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Flow-log analytics engine (SURVEY §2 E1-E8, C1-C7, C13, D4) — the Spark
  * re-expression of the reference's `picoprobe/flow_analyzer.py` and
  * `examples/xloop2023/performance.ipynb` semantics.
  *
  * Everything is a lazy DataFrame transform: at 100 TB the event log is a
  * partitioned table and each function below stays a single shuffle-bounded
  * aggregate (groupBy run/task key) — no driver-side loops over runs, which
  * is the reference's main scalability limit (one network fetch + pandas
  * concat per run, flow_analyzer.py:174-226).
  */
object FlowAnalyzer {

  private val GiB = 1024.0 * 1024.0 * 1024.0

  /** Exact-name column reference. Step names come FROM LOG DATA and are
    * spliced into derived column names, so `col(s"${st}_end")` would
    * PARSE a dotted step name as nested-field access and an apostrophe
    * inside a stack() SQL string was a parser crash — quote as a SQL
    * identifier (embedded backticks double, per the SQL rule).
    */
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Read flow-run JSON (one record per line, FIXTURES F2 shape) with the
    * declared schema — no inference pass, so the read is a single scan and
    * missing optional fields surface as typed nulls, exactly like the
    * reference's tolerant dict access (flow_analyzer.py:244-263).
    */
  def readRuns(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Encoders.product[FlowRun].schema).json(path)

  /** ISO-8601 string → epoch seconds (double, µs precision), with the
    * reference's tz handling (SURVEY §2 E8): strip the zone designator and
    * treat the remaining wall time as UTC — the behavior of
    * `pd.to_datetime(...).dt.tz_localize(None)` on +00:00 data and of the
    * `split('+')[0]` dateutil path (flow_analyzer.py:199-204, 249-250).
    * Session timezone is UTC (core.GraftSession), so `to_timestamp` of the
    * naive string parses as UTC.
    */
  def epochSeconds(c: Column): Column =
    to_timestamp(regexp_replace(c, "(Z|[+-]\\d{2}:?\\d{2})$", ""))
      .cast(DoubleType)

  /** Action-log → wide per-run table (SURVEY §2 E1, flow_analyzer.py:321-346):
    * `{step}_start` from the step's ActionStarted entry, `{step}_end` from its
    * ActionCompleted entry, `{step}_runtime = end − start` (E2), plus
    * `start`/`end`/`flow_runtime` for the whole run. Column groups appear in
    * first-seen step order (min log idx across the input).
    *
    * Plan shape: one groupBy(run_id, state_name) aggregate, a tiny
    * distinct-steps collect for column layout (|steps| is O(10) at any data
    * scale), then one groupBy(run_id) conditional aggregate — two shuffles
    * total, both map-side combinable.
    */
  def pivotActionLog(log: DataFrame): DataFrame = {
    val perStep = log
      .filter(col("code").isin("ActionStarted", "ActionCompleted"))
      .groupBy(col("run_id"), col("state_name"))
      .agg(
        min(when(col("code") === "ActionStarted", col("idx"))).as("first_idx"),
        min(when(col("code") === "ActionStarted", epochSeconds(col("time"))))
          .as("t_start"),
        max(when(col("code") === "ActionCompleted", epochSeconds(col("time"))))
          .as("t_end"))

    val steps: Seq[String] = stepOrder(log)

    val stepCols = steps.flatMap { st =>
      val s = min(when(col("state_name") === st, col("t_start"))).as(s"${st}_start")
      val e = min(when(col("state_name") === st, col("t_end"))).as(s"${st}_end")
      Seq(s, e)
    }
    val aggCols = Seq(min(col("t_start")).as("start"),
      max(col("t_end")).as("end")) ++ stepCols
    val wide = perStep.groupBy("run_id").agg(aggCols.head, aggCols.tail: _*)

    val withRuntimes = steps.foldLeft(
      wide.withColumn("flow_runtime", col("end") - col("start"))) { (df, st) =>
      df.withColumn(s"${st}_runtime", qcol(s"${st}_end") - qcol(s"${st}_start"))
    }
    withRuntimes
  }

  /** First-seen order of steps in the log (flow_analyzer.py:321-346 keeps
    * insertion order of the step dict). Tiny result — safe to collect.
    */
  def stepOrder(log: DataFrame): Seq[String] =
    log.filter(col("code") === "ActionStarted")
      .groupBy("state_name").agg(min("idx").as("ord"))
      .orderBy("ord", "state_name")
      .collect().map(_.getString(0)).toSeq

  /** Relative-time normalization for gantt-style output (SURVEY §2 E3,
    * flow_analyzer.py:402-408): subtract the global min start from every
    * non-runtime time column. The global min is a 1-row aggregate joined
    * back with `crossJoin(broadcast(...))` — an empty-partition window
    * (`min(...).over()`) would move ALL rows to a single partition
    * (WindowExec "No Partition Defined"), a scale-killer at 100× users.
    */
  def relativize(wide: DataFrame): DataFrame = {
    val gmin = wide.agg(min(col("start")).as("__base"))
    val timeCols = wide.columns.filter(c =>
      (c == "start" || c == "end" || c.endsWith("_start") || c.endsWith("_end")))
    timeCols.foldLeft(wide.crossJoin(broadcast(gmin)))(
      (df, c) => df.withColumn(c, col(c) - col("__base"))).drop("__base")
  }

  /** Most recent k runs, re-sorted ascending (SURVEY §2 E7 tail-k,
    * flow_analyzer.py:397-399). Deterministic via the run_id tiebreak.
    */
  def tailK(wide: DataFrame, k: Int): DataFrame =
    wide.orderBy(col("start").desc, col("run_id").desc).limit(k)
      .orderBy(col("start"), col("run_id"))

  /** Per-flow + per-step runtime stats (SURVEY §2 C1-C2,
    * flow_analyzer.py:121-135): one row per metric column with
    * mean/median/std/min/max. Single global aggregate; the unpivot is a
    * stack() over a fixed column list.
    */
  def describeRuntimes(wide: DataFrame): DataFrame = {
    val metricCols = "flow_runtime" +:
      wide.columns.filter(c => c.endsWith("_runtime") && c != "flow_runtime").toSeq
    // unpivot via explode(array(struct…)), not a stack() SQL string: the
    // metric names derive from data-borne step names, and an apostrophe
    // (or any quote char) inside the built SQL was a parser crash
    val stacked = wide.select(
      explode(array(metricCols.map(c =>
        struct(lit(c).as("metric"), qcol(c).cast(DoubleType).as("v"))): _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.v").as("v"))
    stacked.groupBy("metric")
      .agg(count(col("v")).as("n"), avg(col("v")).as("mean"),
        expr("percentile(v, 0.5)").as("median"), stddev(col("v")).as("std"),
        min(col("v")).as("min"), max(col("v")).as("max"))
      .orderBy("metric")
  }

  /** Bytes-transferred + funcX-time usage summary (SURVEY §2 C3-C5,
    * flow_analyzer.py:143-152, 279-293): explode `output`, keep entries
    * carrying `bytes_transferred`, convert to GB; funcX time = Σ step
    * durations for steps in `fxSteps` (the reference derives that set from
    * action URLs containing "funcx", flow_analyzer.py:206-210).
    */
  def describeUsage(runs: DataFrame, fxSteps: Set[String]): DataFrame = {
    val exploded = succeeded(runs)
      .select(col("run_id"), explode(col("output")).as(Seq("step", "o")))
    val bytes = exploded
      .select(col("o.details.bytes_transferred").as("b"))
      .filter(col("b").isNotNull)
      .agg(sum(col("b")).cast(DoubleType).as("total_bytes"),
        avg(col("b")).as("mean_bytes"))
      .select((col("total_bytes") / GiB).as("total_gb"),
        (col("mean_bytes") / GiB).as("mean_gb"))
    val fx = exploded
      .filter(col("step").isin(fxSteps.toSeq: _*))
      .select((epochSeconds(col("o.completion_time")) -
        epochSeconds(col("o.start_time"))).as("d"))
      .agg(sum(col("d")).as("total_funcx_sec"), avg(col("d")).as("mean_funcx_sec"))
    bytes.crossJoin(fx) // both sides are single-row aggregates
  }

  /** Steps excluded from Active time by the reference's notebook
    * (performance.ipynb cell 4 skip-list).
    */
  val TimingSkipSteps: Set[String] = Set("input", "Publishv2Ingest")

  /** Per-run Active/Overhead/Total timing decomposition (SURVEY §2 C13,
    * performance.ipynb cell 4 `get_timing_data`):
    *   - keep SUCCEEDED runs; skip `input` and `Publishv2Ingest` steps;
    *   - per-step duration dispatch: Transfer-style entries use
    *     `request_time→completion_time`, Ingest-style use
    *     `creation_date→completion_date`, everything else the step's own
    *     `start_time→completion_time`;
    *   - clamp every duration to ≥ 0 (`max(t, 0.0)`);
    *   - Active = Σ durations, Total = run completion − start,
    *     Overhead = max(Total − Active, 0).
    */
  def timingData(runs: DataFrame): DataFrame = {
    val d = col("o.details")
    val dur = greatest(lit(0.0),
      when(d("request_time").isNotNull,
        epochSeconds(d("completion_time")) - epochSeconds(d("request_time")))
        .when(d("creation_date").isNotNull,
          epochSeconds(d("completion_date")) - epochSeconds(d("creation_date")))
        .otherwise(epochSeconds(col("o.completion_time")) -
          epochSeconds(col("o.start_time"))))

    succeeded(runs)
      .select(col("run_id"),
        epochSeconds(col("start_time")).as("t0"),
        epochSeconds(col("completion_time")).as("t1"),
        explode(col("output")).as(Seq("step", "o")))
      .filter(!col("step").isin(TimingSkipSteps.toSeq: _*) &&
        !col("o.state_name").isin(TimingSkipSteps.toSeq: _*))
      .groupBy(col("run_id"), col("t0"), col("t1"))
      .agg(sum(dur).as("Active"))
      .select(col("run_id"),
        col("Active"),
        greatest(lit(0.0), col("t1") - col("t0") - col("Active")).as("Overhead"),
        (col("t1") - col("t0")).as("Total"))
      .orderBy("run_id")
  }

  /** SUCCEEDED-only filter (SURVEY §2 B1, flow_analyzer.py:107-109) —
    * applied before any per-run work so Catalyst pushes it to the scan.
    */
  def succeeded(runs: DataFrame): DataFrame =
    runs.filter(col("status") === "SUCCEEDED")

  /** Per-run usage columns (SURVEY §2 C5, flow_analyzer.py:232-319):
    *   - `{step}_bytes_transferred` for every step that reports transfer
    *     details anywhere in the data, plus the row-wise
    *     `total_bytes_transferred` (missing steps count 0, matching the
    *     reference's running sum over present entries);
    *   - `{step}_action_time`: Transfer-style steps use
    *     `request_time→completion_time`, Ingest-style (index_id) use
    *     `creation_date→completion_date` — index details win when both
    *     are present, mirroring the reference's overwrite order
    *     (flow_analyzer.py:244-263);
    *   - `funcx_task_ids`: the step `action_id`s for the funcX steps
    *     present on the run (flow_analyzer.py:296-319).
    *
    * The column SET is discovered with one tiny aggregate over the
    * exploded step map (|steps| is O(10) at any scale — same contract as
    * [[stepOrder]]); the per-run values are then pure map lookups, no
    * explode or shuffle on the main pass.
    */
  def usageColumns(runs: DataFrame, fxSteps: Set[String] = Set.empty): DataFrame = {
    val flags = succeeded(runs)
      .select(explode(col("output")).as(Seq("step", "o")))
      .groupBy("step")
      .agg(max(col("o.details.bytes_transferred").isNotNull).as("has_bytes"),
        max(col("o.details.index_id").isNotNull).as("has_index"))
      .orderBy("step")
      .collect()
    val byteSteps = flags.filter(_.getAs[Boolean]("has_bytes"))
      .map(_.getAs[String]("step")).toSeq
    val timedSteps = flags
      .filter(r => r.getAs[Boolean]("has_bytes") || r.getAs[Boolean]("has_index"))
      .map(_.getAs[String]("step")).toSeq

    def det(st: String) = col("output").getItem(st).getField("details")
    val byteCols = byteSteps.map(st =>
      det(st).getField("bytes_transferred").as(s"${st}_bytes_transferred"))
    val totalBytes = byteSteps
      .map(st => coalesce(det(st).getField("bytes_transferred"), lit(0L)))
      .reduceOption(_ + _).getOrElse(lit(0L): Column)
      .as("total_bytes_transferred")
    val actionCols = timedSteps.map { st =>
      val d = det(st)
      when(d.getField("index_id").isNotNull,
        epochSeconds(d.getField("completion_date")) -
          epochSeconds(d.getField("creation_date")))
        .when(d.getField("bytes_transferred").isNotNull,
          epochSeconds(d.getField("completion_time")) -
            epochSeconds(d.getField("request_time")))
        .as(s"${st}_action_time")
    }
    val fxIds = filter(
      array(fxSteps.toSeq.sorted.map(st =>
        col("output").getItem(st).getField("action_id")): _*),
      _.isNotNull).as("funcx_task_ids")

    val cols = Seq(col("run_id"), col("action_id")) ++ byteCols ++
      Seq(totalBytes) ++ actionCols ++ Seq(fxIds)
    succeeded(runs).select(cols: _*)
  }

  /** The reference's full flow-log wide table (flow_analyzer.py:154-232):
    * the per-step start/end/runtime pivot joined with the per-run usage
    * columns, plus `total_funcx_time` = Σ `{step}_runtime` over the funcX
    * steps (flow_analyzer.py:211-221; null step runtimes propagate, like
    * pandas NaN). One equi-join on the run key — both sides are already
    * one-row-per-run aggregates.
    */
  def wideTable(runs: DataFrame, log: DataFrame, fxSteps: Set[String]): DataFrame = {
    val pivot = pivotActionLog(log)
    val joined = pivot.join(usageColumns(runs, fxSteps), Seq("run_id"))
    val fxRuntimes = fxSteps.toSeq.sorted
      .filter(st => pivot.columns.contains(s"${st}_runtime"))
      .map(st => qcol(s"${st}_runtime"))
    joined.withColumn("total_funcx_time",
      fxRuntimes.reduceOption(_ + _).getOrElse(lit(0.0): Column))
  }

  /** funcX transitions event-pair analysis (SURVEY §2 D4, ipynb cell 8):
    * dedup on the (task_uuid, message) PK, optional task-group filter with
    * the reference's `tg_` prefix strip, then per-task
    * exec = (execution-end − execution-start)/1e9 and
    * total = (result-received − received)/1e9 seconds. Conditional
    * aggregation instead of self-joins: one shuffle on task_uuid.
    */
  def taskTimes(transitions: DataFrame, taskGroup: Option[String] = None): DataFrame = {
    def at(msg: String) = min(when(col("message") === msg, col("state_time")))
    val base = transitions.dropDuplicates("task_uuid", "message")
    val filtered = taskGroup match {
      case Some(tg) => base.filter(col("task_group_uuid") === tg.stripPrefix("tg_"))
      case None     => base
    }
    filtered.groupBy("task_uuid")
      .agg(((at("execution-end") - at("execution-start")) / 1e9).as("exec_sec"),
        ((at("result-received") - at("received")) / 1e9).as("total_sec"))
      .orderBy("task_uuid")
  }
}
