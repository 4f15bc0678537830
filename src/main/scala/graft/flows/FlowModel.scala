package graft.flows

/** Typed data model for flow-run analytics (SURVEY §1.1, FIXTURES F2-F4).
  *
  * Mirrors the record shapes the reference consumes:
  * flow-run JSON (/root/reference/picoprobe/flow_analyzer.py:168-194 and
  * examples/xloop2023/performance.ipynb cell 4), per-run action-log entries
  * (flow_analyzer.py:321-346), and the funcX `transitions` event table
  * (examples/xloop2023/data/picoprobe_task_data.db, ipynb cell 8).
  *
  * Encoders derive from these case classes; `Option` fields become nullable
  * columns, so the same schema reads real JSON via `spark.read.json`.
  */
final case class StepDetails(
    bytes_transferred: Option[Long] = None,
    effective_bytes_per_second: Option[Long] = None,
    // Transfer-style completion interval
    request_time: Option[String] = None,
    completion_time: Option[String] = None,
    // Ingest-style completion interval
    index_id: Option[String] = None,
    creation_date: Option[String] = None,
    completion_date: Option[String] = None)

final case class StepOutput(
    action_id: String,
    state_name: String,
    status: String,
    start_time: String,
    completion_time: String,
    details: StepDetails = StepDetails())

final case class FlowRun(
    run_id: String,
    action_id: String,
    flow_id: String,
    status: String,
    start_time: String,
    completion_time: String,
    output: Map[String, StepOutput])

/** One action-log line; `idx` is the log position (drives first-seen step
  * ordering in the wide pivot, flow_analyzer.py:321-346).
  */
final case class LogEntry(
    run_id: String,
    idx: Int,
    code: String, // "ActionStarted" | "ActionCompleted" | other
    time: String,
    state_name: String)

/** funcX task-transition event; PK (task_uuid, message); `state_time` is
  * ns since epoch (SURVEY §1.1).
  */
final case class Transition(
    task_uuid: String,
    message: String,
    state_time: Long,
    user_id: Int = 0,
    task_group_uuid: String = "",
    actor: String = "",
    endpoint_uuid: String = "",
    function_uuid: String = "",
    container_uuid: String = "",
    asctime: String = "")
