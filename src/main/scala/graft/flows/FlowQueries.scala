package graft.flows

import graft.QueryDef
import graft.core.{Exact, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Oracle-checked realizations of the flow-analytics operators (SURVEY §2
  * E1-E3, E7, C2/C6, C10, C13) over the harness `events` table — the same
  * aggregate shapes `FlowAnalyzer` applies to flow-run logs, expressed where
  * DuckDB can verify them. `events.ts` is a ns-epoch long (Tables.load);
  * all interval math stays in integer µs until a final IEEE division, so
  * results are bit-identical on any partitioning.
  */
object FlowQueries {

  import Exact.{dsum, sqlSum}

  /** Wide start/end/runtime pivot per run-analog (SURVEY §2 E1+E2, the
    * `{step}_start/{step}_end/{step}_runtime` layout of
    * flow_analyzer.py:321-346): per user, first/last event per step type.
    * One conditional aggregate — a single shuffle of |users| rows.
    */
  val f1StepPivot: QueryDef = QueryDef(
    "f1_step_pivot",
    (s, dir) => {
      val steps = Seq("click", "view", "purchase")
      def first(t: String) =
        expr(s"min(case when event_type = '$t' then ts end) div 1000").as(s"${t}_first")
      def last(t: String) =
        expr(s"max(case when event_type = '$t' then ts end) div 1000").as(s"${t}_last")
      val aggs = steps.flatMap(t => Seq(first(t), last(t)))
      val base = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(aggs.head, aggs.tail: _*)
      steps.foldLeft(base)((df, t) =>
        df.withColumn(s"${t}_runtime_sec",
          (col(s"${t}_last") - col(s"${t}_first")).cast(DoubleType) /
            lit(1000000).cast(DoubleType)))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
        MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click')    AS click_first,
        MAX(epoch_us(ts)) FILTER (WHERE event_type = 'click')    AS click_last,
        MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view')     AS view_first,
        MAX(epoch_us(ts)) FILTER (WHERE event_type = 'view')     AS view_last,
        MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS purchase_first,
        MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS purchase_last,
        CAST(MAX(epoch_us(ts)) FILTER (WHERE event_type = 'click')
           - MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS DOUBLE)
          / CAST(1000000 AS DOUBLE) AS click_runtime_sec,
        CAST(MAX(epoch_us(ts)) FILTER (WHERE event_type = 'view')
           - MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS DOUBLE)
          / CAST(1000000 AS DOUBLE) AS view_runtime_sec,
        CAST(MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
           - MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
          / CAST(1000000 AS DOUBLE) AS purchase_runtime_sec
      FROM events GROUP BY user_id ORDER BY user_id""")
  )

  /** describe()-style runtime stats per cohort (SURVEY §2 C2/C6,
    * flow_analyzer.py:127-135 / `timing_df.describe()`): count, mean,
    * median, std, min, max over per-user activity spans (integer ms).
    * Std via the exact sum/sum-of-squares identity (order-independent).
    */
  val f2RuntimeDescribe: QueryDef = QueryDef(
    "f2_runtime_describe",
    (s, dir) => {
      val spans = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("(max(ts div 1000) - min(ts div 1000)) div 1000").as("span_ms"))
        .withColumn("cohort", col("user_id") % 4)
      val v  = col("span_ms")
      val n  = count(lit(1))
      val sm = dsum(v)
      // spans are ~1e9 ms, so their SQUARES (~1e18) sit outside dsum's
      // split-long envelope (|x| < 9.2e14) — the sum of squares takes
      // the wide Decimal(30,4) accumulator; the plain sum stays fast
      val sq = Exact.dsumWide(v * v)
      spans.groupBy("cohort")
        .agg(n.as("n"), (sm / n).as("mean_ms"),
          expr("percentile(span_ms, 0.5)").as("p50_ms"),
          sqrt((sq - sm * sm / n) / (n - lit(1))).as("std_ms"),
          min(v).as("min_ms"), max(v).as("max_ms"))
        .orderBy("cohort")
    },
    Some(s"""
      WITH spans AS (
        SELECT user_id, user_id % 4 AS cohort,
               (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000 AS span_ms
        FROM events GROUP BY user_id)
      SELECT cohort, COUNT(*) AS n,
        ${sqlSum("span_ms")} / COUNT(*) AS mean_ms,
        MEDIAN(span_ms) AS p50_ms,
        SQRT((${sqlSum("span_ms * span_ms")} -
              ${sqlSum("span_ms")} * ${sqlSum("span_ms")} / COUNT(*)) / (COUNT(*) - 1)) AS std_ms,
        MIN(span_ms) AS min_ms, MAX(span_ms) AS max_ms
      FROM spans GROUP BY cohort ORDER BY cohort""")
  )

  /** Relative-time normalization (SURVEY §2 C10/E3,
    * flow_analyzer.py:402-408): each user's first event relative to the
    * global minimum. The global min is a separate 1-row aggregate joined
    * via `crossJoin(broadcast(...))` — an empty-partition window would
    * funnel every grouped row through a single partition (the WindowExec
    * "No Partition Defined" path), which dies at 100× users. Global
    * min(ts) over all events equals the min of per-user firsts.
    */
  val f3RelativeStart: QueryDef = QueryDef(
    "f3_relative_start",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val gmin = e.agg(expr("min(ts) div 1000").as("__g"))
      e.groupBy("user_id")
        .agg(expr("min(ts) div 1000").as("t_first"))
        .crossJoin(broadcast(gmin))
        .withColumn("rel_sec",
          (col("t_first") - col("__g")).cast(DoubleType) /
            lit(1000000).cast(DoubleType))
        .drop("__g")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, t_first,
             CAST(t_first - MIN(t_first) OVER () AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS rel_sec
      FROM (SELECT user_id, MIN(epoch_us(ts)) AS t_first FROM events GROUP BY user_id)
      ORDER BY user_id""")
  )

  /** Active/Overhead/Total decomposition (SURVEY §2 C13, performance.ipynb
    * cell 4): per user, Total = full span, Active = Σ per-step spans,
    * Overhead = max(Total − Active, 0) — the notebook's clamp. Two
    * aggregates over the same shuffle key (user_id), all-integer µs math.
    */
  val f4ActiveOverhead: QueryDef = QueryDef(
    "f4_active_overhead",
    (s, dir) => {
      // single scan: per-(user, step) extrema first, then both Active and
      // Total derive from that aggregate — no second read of events, no
      // join; the second shuffle is on a strictly narrower key
      val perStep = Tables.load(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(expr("min(ts div 1000)").as("mn"), expr("max(ts div 1000)").as("mx"))
      perStep.groupBy("user_id")
        .agg(sum(col("mx") - col("mn")).as("active_us"),
          (max(col("mx")) - min(col("mn"))).as("total_us"))
        .select(col("user_id"),
          (col("active_us").cast(DoubleType) / lit(1000000).cast(DoubleType)).as("active_sec"),
          (greatest(lit(0L), col("total_us") - col("active_us")).cast(DoubleType) /
            lit(1000000).cast(DoubleType)).as("overhead_sec"),
          (col("total_us").cast(DoubleType) / lit(1000000).cast(DoubleType)).as("total_sec"))
        .orderBy("user_id")
    },
    Some("""
      WITH per_step AS (
        SELECT user_id, event_type,
               MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS step_span
        FROM events GROUP BY user_id, event_type),
      active AS (SELECT user_id, SUM(step_span) AS active_us FROM per_step GROUP BY user_id),
      total AS (
        SELECT user_id, MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS total_us
        FROM events GROUP BY user_id)
      SELECT t.user_id,
        CAST(a.active_us AS DOUBLE) / CAST(1000000 AS DOUBLE) AS active_sec,
        CAST(GREATEST(0, t.total_us - a.active_us) AS DOUBLE)
          / CAST(1000000 AS DOUBLE) AS overhead_sec,
        CAST(t.total_us AS DOUBLE) / CAST(1000000 AS DOUBLE) AS total_sec
      FROM total t JOIN active a ON t.user_id = a.user_id
      ORDER BY t.user_id""")
  )

  /** Tail-k: the k most recently active users, re-sorted ascending
    * (SURVEY §2 E7/B2, flow_analyzer.py:397-399). Deterministic via the
    * user_id tiebreak; top-k is a partial TakeOrdered, no full sort.
    */
  val f5TailK: QueryDef = QueryDef(
    "f5_tail_k",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("max(ts) div 1000").as("t_last"), count(lit(1)).as("n_events"))
        .orderBy(col("t_last").desc, col("user_id").desc).limit(50)
        .orderBy("t_last", "user_id"),
    Some("""
      SELECT * FROM (
        SELECT user_id, MAX(epoch_us(ts)) AS t_last, COUNT(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY t_last DESC, user_id DESC LIMIT 50)
      ORDER BY t_last, user_id""")
  )

  /** Per-entity wide usage columns with a row-wise total (SURVEY §2 C5 —
    * the `{step}_bytes_transferred` / `total_bytes_transferred` /
    * `total_funcx_time` layout of flow_analyzer.py:279-294, 211-221, which
    * [[FlowAnalyzer.usageColumns]] computes over flow-run JSON): per user,
    * exact per-type value sums, a row-wise total where absent types count
    * 0 (the reference's running sum over *present* map entries), and a
    * null-propagating funcX-style total (pandas-NaN semantics). One
    * conditional aggregate — a single shuffle of |users| rows.
    */
  val f6UsageWide: QueryDef = QueryDef(
    "f6_usage_wide",
    (s, dir) => {
      val steps = Seq("click", "view", "purchase")
      def b(t: String) =
        dsum(when(col("event_type") === t, col("value"))).as(s"${t}_bytes")
      val aggs = steps.map(b)
      Tables.load(s, dir, "events")
        .groupBy("user_id").agg(aggs.head, aggs.tail: _*)
        .withColumn("total_bytes_transferred",
          steps.map(t => coalesce(col(s"${t}_bytes"), lit(0.0).cast(DoubleType)))
            .reduce(_ + _))
        .withColumn("total_funcx_time", col("view_bytes") + col("purchase_bytes"))
        .orderBy("user_id")
    },
    Some(s"""
      SELECT user_id,
        ${sqlSum("CASE WHEN event_type = 'click' THEN value END")} AS click_bytes,
        ${sqlSum("CASE WHEN event_type = 'view' THEN value END")} AS view_bytes,
        ${sqlSum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase_bytes,
        (COALESCE(${sqlSum("CASE WHEN event_type = 'click' THEN value END")}, CAST(0.0 AS DOUBLE))
         + COALESCE(${sqlSum("CASE WHEN event_type = 'view' THEN value END")}, CAST(0.0 AS DOUBLE)))
         + COALESCE(${sqlSum("CASE WHEN event_type = 'purchase' THEN value END")}, CAST(0.0 AS DOUBLE))
          AS total_bytes_transferred,
        ${sqlSum("CASE WHEN event_type = 'view' THEN value END")}
          + ${sqlSum("CASE WHEN event_type = 'purchase' THEN value END")} AS total_funcx_time
      FROM events GROUP BY user_id ORDER BY user_id""")
  )

  /** Runtime outlier flagging — the "which runs were abnormal" triage
    * query over the f2 cohort statistics: each user's span scores
    * z = (span − cohort mean)/cohort std and |z| > 2 flags the outlier.
    * The cohort stats are the exact decimal-sum mean/std (order-free), z
    * is one double expression identical on both engines, and the 4-row
    * stats table broadcasts back over the spans — no second shuffle of
    * the runs.
    */
  val f7RuntimeOutliers: QueryDef = QueryDef(
    "f7_runtime_outliers",
    (s, dir) => {
      val spans = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("(max(ts div 1000) - min(ts div 1000)) div 1000").as("span_ms"))
        .withColumn("cohort", col("user_id") % 4)
      val v = col("span_ms")
      val n = count(lit(1))
      val sm = dsum(v)
      // spans are ~1e9 ms, so their SQUARES (~1e18) sit outside dsum's
      // split-long envelope (|x| < 9.2e14) — the sum of squares takes
      // the wide Decimal(30,4) accumulator; the plain sum stays fast
      val sq = Exact.dsumWide(v * v)
      val stats = spans.groupBy("cohort")
        .agg((sm / n).as("mean_ms"),
          sqrt((sq - sm * sm / n) / (n - lit(1))).as("std_ms"))
      spans.join(broadcast(stats), Seq("cohort"))
        .withColumn("z",
          (v.cast(org.apache.spark.sql.types.DoubleType) - col("mean_ms")) / col("std_ms"))
        .withColumn("is_outlier", abs(col("z")) > 2.0)
        .select("user_id", "cohort", "span_ms", "z", "is_outlier")
        .orderBy("user_id")
    },
    Some(s"""
      WITH spans AS (
        SELECT user_id, user_id % 4 AS cohort,
               (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000 AS span_ms
        FROM events GROUP BY user_id),
      stats AS (
        SELECT cohort,
          ${sqlSum("span_ms")} / COUNT(*) AS mean_ms,
          SQRT((${sqlSum("span_ms * span_ms")} -
                ${sqlSum("span_ms")} * ${sqlSum("span_ms")} / COUNT(*)) / (COUNT(*) - 1)) AS std_ms
        FROM spans GROUP BY cohort)
      SELECT user_id, s.cohort, span_ms,
             (CAST(span_ms AS DOUBLE) - mean_ms) / std_ms AS z,
             ABS((CAST(span_ms AS DOUBLE) - mean_ms) / std_ms) > 2.0 AS is_outlier
      FROM spans s JOIN stats USING (cohort)
      ORDER BY user_id""")
  )

  /** Step-transition MARKOV matrix — the reference's transitions analysis
    * (examples/xloop2023 state_time pairs) as a first-class operator:
    * per user the event stream total-orders on (ts, event_id), each
    * consecutive pair is one (from_step, to_step) observation, and the
    * matrix row-normalizes to empirical transition probabilities. The
    * probability is emitted as the exact rational pair (n, row_total)
    * PLUS one IEEE division — both engines divide the same two BIGINTs,
    * so the double compares exactly (the q46 rational-not-ln
    * discipline).
    *
    * Scale: the lag window partitions by user (parallel, one keyed
    * shuffle), the matrix aggregate is |steps|² cells with map-side
    * combine, and the row totals join back over those same tiny cells.
    */
  val f8Transitions: QueryDef = QueryDef(
    "f8_transitions",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("t_us", "event_id")
      // µs-truncated ordering: the cross-engine timestamp precision
      val m = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("t_us"),
          col("event_id"), col("event_type"))
        .withColumn("from_step", lag("event_type", 1).over(w))
        .filter(col("from_step").isNotNull)
        .groupBy(col("from_step"), col("event_type").as("to_step"))
        .agg(count(lit(1)).as("n"))
      val totals = m.groupBy("from_step")
        .agg(sum(col("n")).as("row_total"))
      m.join(totals, Seq("from_step"))
        .select(col("from_step"), col("to_step"), col("n"), col("row_total"),
          (col("n").cast(DoubleType) / col("row_total").cast(DoubleType))
            .as("p"))
        .orderBy("from_step", "to_step")
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS from_step
        FROM events),
      m AS (
        SELECT from_step, event_type AS to_step, COUNT(*) AS n
        FROM seq WHERE from_step IS NOT NULL
        GROUP BY from_step, event_type),
      t AS (SELECT from_step, CAST(SUM(n) AS BIGINT) AS row_total
            FROM m GROUP BY from_step)
      SELECT m.from_step, m.to_step, m.n, t.row_total,
             CAST(m.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS p
      FROM m JOIN t USING (from_step)
      ORDER BY from_step, to_step""")
  )

  /** BOTTLENECK attribution (f9) — the "which step eats the wall-clock"
    * question every flow dashboard answers (the reference eyeballs it
    * off timing plots, flow_analyzer.py): wall-clock between consecutive
    * events is DWELL attributed to the step that was active (the
    * preceding event's type), summed per (user, step); each user's
    * bottleneck is their max-dwell step (ties → lexicographically last
    * type, mirrored in both engines); the rollup reports how often each
    * step is the bottleneck and its share of ALL dwell time. Integer-µs
    * arithmetic end to end (q55's lead-gap idiom — one user-keyed
    * window, one shuffle); the only FP op is the final share division.
    */
  val f9Bottleneck: QueryDef = QueryDef(
    "f9_bottleneck",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      val perStep = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("t_us"), col("event_id"))
        .withColumn("nxt", lead("t_us", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("user_id", "event_type")
        .agg(sum(col("nxt") - col("t_us")).as("step_us"))
      val top = perStep
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("step_us").desc, col("event_type").desc)))
        .filter(col("rn") === 1)
      val grand = perStep.agg(sum(col("step_us")).as("g"))
      top.crossJoin(broadcast(grand))
        .groupBy("event_type", "g")
        .agg(count(lit(1)).as("n_users"), sum(col("step_us")).as("us_sum"))
        .select(col("event_type"), col("n_users"), col("us_sum"),
          (col("us_sum").cast("double") / col("g").cast("double"))
            .as("share"))
        .orderBy("event_type")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id
        FROM events),
      g AS (
        SELECT user_id, event_type,
               LEAD(t_us) OVER (PARTITION BY user_id
                 ORDER BY t_us, event_id) - t_us AS dwell
        FROM e),
      ps AS (
        SELECT user_id, event_type, CAST(SUM(dwell) AS BIGINT) AS step_us
        FROM g WHERE dwell IS NOT NULL GROUP BY 1, 2),
      top AS (
        SELECT * FROM (
          SELECT ps.*, ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY step_us DESC, event_type DESC) AS rn FROM ps)
        WHERE rn = 1),
      grand AS (SELECT CAST(SUM(step_us) AS BIGINT) AS gt FROM ps)
      SELECT event_type, COUNT(*) AS n_users,
             CAST(SUM(step_us) AS BIGINT) AS us_sum,
             CAST(CAST(SUM(step_us) AS BIGINT) AS DOUBLE)
               / CAST(gt AS DOUBLE) AS share
      FROM top, grand GROUP BY event_type, gt ORDER BY event_type""")
  )

  val all: Seq[QueryDef] =
    Seq(f1StepPivot, f2RuntimeDescribe, f3RelativeStart, f4ActiveOverhead,
      f5TailK, f6UsageWide, f7RuntimeOutliers, f8Transitions, f9Bottleneck)
}
