package graft.queries

import graft.QueryDef
import graft.core.{Exact, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Event-log analytics (SURVEY §2 E/D4): the Spark re-expression of the
  * reference's flow-log and transitions analysis
  * (/root/reference/picoprobe/flow_analyzer.py:321-346 pivot,
  * examples/xloop2023/performance.ipynb cell 8 event pairs).
  *
  * `events.ts` is a ns-epoch long (see Tables.load) — the exact
  * representation of the reference's `transitions.state_time`.
  */
object EventQueries {

  import Exact.{money, sqlMoney}

  private val NsPerHour = 3600L * 1000L * 1000L * 1000L

  /** Window functions: per-supplier running totals + row numbering.
    * One shuffle on the partition key, then a partition-local sort;
    * quantities are integer-valued so the running sum is exact.
    */
  val q7WindowRunning: QueryDef = QueryDef(
    "q7_window_running",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("running_qty",
          sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("l_suppkey", "rn")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        ROW_NUMBER() OVER w AS rn,
        SUM(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      FROM lineitem WHERE l_suppkey <= 10
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, rn""")
  )

  /** Event-log → wide pivot via conditional aggregation (SURVEY §2 E1).
    * Conditional agg instead of `.pivot()` keeps column names static and
    * the plan a single map-side-combinable aggregate — one shuffle of
    * |users| rows regardless of input size.
    */
  val q8PivotCounts: QueryDef = QueryDef(
    "q8_pivot_counts",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      def n(t: String)   = count(when(col("event_type") === t, 1)).as(s"n_$t")
      def amt(t: String) = Exact
        .dsumScaled(money(when(col("event_type") === t, col("value"))), 2)
        .as(s"amt_$t")
      ev.groupBy("user_id")
        .agg(n("click"), n("view"), n("signup"), n("purchase"), n("error"),
          amt("purchase"), amt("click"))
        .orderBy("user_id")
    },
    Some(s"""
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
        COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
        COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
        CAST(SUM(${sqlMoney("value")}) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS amt_purchase,
        CAST(SUM(${sqlMoney("value")}) FILTER (WHERE event_type = 'click') AS DOUBLE) AS amt_click
      FROM events GROUP BY user_id ORDER BY user_id""")
  )

  /** Event-pair interval analysis (SURVEY §2 D4, ipynb cell 8:
    * `execution-start` vs `execution-end` per task → duration in s).
    * Pivot-style min-per-message beats a self-join: one aggregate, no
    * duplicate scan, no join skew on hot keys.
    */
  val q9EventPairs: QueryDef = QueryDef(
    "q9_event_pairs",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(
          // µs precision: the smallest unit both engines agree on
          // (DuckDB truncates parquet NANOS to TIMESTAMP µs on read).
          expr("min(case when event_type = 'signup' then ts end) div 1000").as("t_signup"),
          expr("min(case when event_type = 'purchase' then ts end) div 1000").as("t_purchase"))
        .filter(col("t_signup").isNotNull && col("t_purchase").isNotNull)
        .withColumn("delta_sec",
          (col("t_purchase") - col("t_signup")) / lit(1000000.0))
        .orderBy("user_id"),
    Some("""
      SELECT user_id, t_signup, t_purchase,
             CAST(t_purchase - t_signup AS DOUBLE) / CAST(1000000 AS DOUBLE) AS delta_sec
      FROM (
        SELECT user_id,
          MIN(epoch_us(ts)) FILTER (WHERE event_type = 'signup')   AS t_signup,
          MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id)
      WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
      ORDER BY user_id""")
  )

  /** Time-bucket aggregation (SURVEY §2 E8/C13 epoch arithmetic): events
    * per hour. Integer floor-division on the ns epoch — exact, and at
    * scale the natural partition key for an events table.
    */
  val q14TimeBuckets: QueryDef = QueryDef(
    "q14_time_buckets",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("hr", expr(s"ts div ${NsPerHour}L"))
        .groupBy("hr")
        .agg(count(lit(1)).as("n"),
          Exact.dsumScaled(money(col("value")), 2).as("total_value"))
        .orderBy("hr"),
    Some(s"""
      SELECT epoch_ns(ts) // ${NsPerHour} AS hr, COUNT(*) AS n,
             CAST(SUM(${sqlMoney("value")}) AS DOUBLE) AS total_value
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Per-user activity span (SURVEY §2 C10/E2: relative time + interval
    * arithmetic — `flow_runtime = end − start`).
    */
  val q15UserSpan: QueryDef = QueryDef(
    "q15_user_span",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("min(ts) div 1000").as("t_first"),
          expr("max(ts) div 1000").as("t_last"))
        .withColumn("span_sec", (col("t_last") - col("t_first")) / lit(1000000.0))
        .orderBy("user_id"),
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             MIN(epoch_us(ts)) AS t_first, MAX(epoch_us(ts)) AS t_last,
             CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS span_sec
      FROM events GROUP BY user_id ORDER BY user_id""")
  )

  /** As-of (temporal) join: each purchase matched to the same user's most
    * recent click at-or-before it — the canonical operator Spark's built-in
    * joins lack. Spark-first realization: tag-and-union both sides, one
    * running `last(click, ignoreNulls)` window over (user, time) — a
    * SINGLE shuffle on user_id with no join explosion and no range-join
    * quadratic blowup; at scale the window is as parallel as the user
    * count. The match runs at the column's FULL ns precision (µs only in
    * the output columns), clicks sort before purchases at equal ns (the
    * inclusive `p.ts >= c.ts` semantics), and ties among equal-ts clicks
    * break on max click_id — the oracle spells out the identical
    * latest-(ts, event_id) rule, so both sides are deterministic even on
    * data with sub-µs orderings or duplicate (user, ts) clicks.
    */
  val q16AsofJoin: QueryDef = QueryDef(
    "q16_asof_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          lit(0).as("tag"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          lit(1).as("tag"), col("event_id").as("purchase_id"))
      val tagged = clicks
        .withColumn("purchase_id", lit(null).cast("long"))
        .unionByName(purchases.withColumn("click_id", lit(null).cast("long")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "tag", "click_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      tagged
        .withColumn("last_click",
          last(when(col("tag") === 0,
            struct(col("ts").as("ct"), col("click_id").as("cid"))), ignoreNulls = true)
            .over(w))
        .filter(col("tag") === 1 && col("last_click").isNotNull)
        .select(col("purchase_id"), col("user_id"),
          expr("ts div 1000").as("t_purchase_us"),
          col("last_click.cid").as("click_id"),
          expr("last_click.ct div 1000").as("t_click_us"),
          ((expr("ts div 1000") - expr("last_click.ct div 1000")).cast(DoubleType) /
            lit(1000000.0)).as("wait_sec"))
        .orderBy("purchase_id")
    },
    Some("""
      SELECT purchase_id, user_id, t_purchase_us, click_id, t_click_us,
             CAST(t_purchase_us - t_click_us AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS wait_sec
      FROM (
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_us(p.ts) AS t_purchase_us,
               c.event_id AS click_id, epoch_us(c.ts) AS t_click_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts)
      WHERE rn = 1
      ORDER BY purchase_id""")
  )

  /** Nested JSON extraction (SURVEY §2 F map/json: `get_json_object`
    * analog of the reference's nested-dict gets, flow_analyzer.py:244-263).
    */
  val q17JsonExtract: QueryDef = QueryDef(
    "q17_json_extract",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""
      SELECT CAST(props->>'$.k' AS INTEGER) AS k, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Semi-structured analytics through Spark 4's VARIANT type — the
    * schema-on-read successor to string-path extraction (q17): a nested
    * JSON document (derived deterministically from each event so both
    * engines build the identical text) is `parse_json`ed ONCE into the
    * binary variant encoding and then probed with typed `variant_get`
    * paths — object fields, array elements, booleans — instead of
    * re-parsing the string per extraction. At scale that is the
    * difference between one parse + cheap binary probes and N string
    * parses per row; the oracle runs the same paths with DuckDB's JSON
    * operators.
    */
  val q44Variant: QueryDef = QueryDef(
    "q44_variant",
    (s, dir) => {
      val k = get_json_object(col("props"), "$.k")
      val j = concat(lit("""{"meta":{"k":"""), k,
        lit(""","tags":["x"""), expr("cast(get_json_object(props, '$.k') as int) % 3"),
        lit("""","y"],"ok":true},"id":"""), col("event_id"), lit("}"))
      Tables.load(s, dir, "events")
        .withColumn("v", parse_json(j))
        .select(
          try_variant_get(col("v"), "$.meta.k", "int").as("k"),
          try_variant_get(col("v"), "$.meta.tags[0]", "string").as("tag0"),
          try_variant_get(col("v"), "$.meta.ok", "boolean").as("ok"),
          try_variant_get(col("v"), "$.id", "bigint").as("id"))
        .groupBy("k", "tag0")
        .agg(count(lit(1)).as("n"), max(col("id")).as("max_id"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
        .orderBy("k")
    },
    Some("""
      WITH j AS (
        SELECT '{"meta":{"k":' || (props->>'$.k') ||
               ',"tags":["x' || (CAST(props->>'$.k' AS INTEGER) % 3) ||
               '","y"],"ok":true},"id":' || event_id || '}' AS doc
        FROM events),
      e AS (
        SELECT CAST(doc->>'$.meta.k' AS INTEGER) AS k,
               doc->>'$.meta.tags[0]' AS tag0,
               CAST(doc->>'$.meta.ok' AS BOOLEAN) AS ok,
               CAST(doc->>'$.id' AS BIGINT) AS id
        FROM j)
      SELECT k, tag0, COUNT(*) AS n, MAX(id) AS max_id,
             CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
      FROM e GROUP BY k, tag0 ORDER BY k""")
  )

  /** Trending leaderboard — top-3 most active users PER HOUR: the
    * dashboard query every event system serves, composed from the
    * engine's own pieces: hour bucketing (integer ns division) feeds the
    * bounded-heap `top_k` aggregate (q29's
    * [[graft.expressions.TopKAggExpr]]), so the second exchange carries
    * at most k pairs per hour instead of every (hour, user) count — at
    * scale the difference between a leaderboard and a full re-sort of
    * the activity table. Oracle: the identical window-rank formulation
    * with the same (count DESC, user ASC) total order.
    */
  val q45Trending: QueryDef = QueryDef(
    "q45_trending",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("hr", expr(s"ts div ${NsPerHour}L"))
        .groupBy("hr", "user_id")
        .agg(count(lit(1)).as("n"))
        .groupBy("hr")
        .agg(graft.expressions.TopK.topK(col("n").cast(DoubleType),
          col("user_id"), 3).as("top"))
        .select(col("hr"), explode(col("top")).as("t"))
        .select(col("hr"), col("t.id").as("user_id"),
          col("t.value").cast("long").as("n"))
        .orderBy(col("hr"), col("n").desc, col("user_id")),
    Some(s"""
      SELECT hr, user_id, n FROM (
        SELECT hr, user_id, n,
               ROW_NUMBER() OVER (PARTITION BY hr
                 ORDER BY n DESC, user_id) AS rn
        FROM (SELECT epoch_ns(ts) // ${NsPerHour} AS hr, user_id,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2))
      WHERE rn <= 3
      ORDER BY hr, n DESC, user_id""")
  )

  /** Gap-based sessionization (SURVEY §2 E-window generalized): a user's
    * events split into sessions wherever the gap to the previous event
    * exceeds one hour — the classic stateful-analytics primitive behind
    * engagement metrics and streaming session windows.
    *
    * Plan shape at 100 TB: ONE shuffle on user_id; the lag-diff, the
    * session-id running sum, and both aggregations are partition-local
    * after it (the second groupBy's (user_id, sess_id) keys are a
    * superset of the window partitioning, so no re-shuffle). Everything
    * is integer µs arithmetic — exact on both engines.
    */
  val q21Sessions: QueryDef = QueryDef(
    "q21_sessions",
    (s, dir) => {
      val gapUs = 3600L * 1000000L // 1 hour
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("t_us"), col("event_id"))
        .withColumn("prev_us", lag("t_us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("t_us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess_id",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          (max(col("t_us")) - min(col("t_us"))).as("span_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          sum(col("n_events")).as("total_events"),
          max(col("span_us")).as("max_session_span_us"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_sessions,
             MAX(n_events) AS max_session_events,
             CAST(SUM(n_events) AS BIGINT) AS total_events,
             MAX(span_us) AS max_session_span_us
      FROM (
        SELECT user_id, sess_id, COUNT(*) AS n_events,
               MAX(t_us) - MIN(t_us) AS span_us
        FROM (
          SELECT user_id, t_us,
                 SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM (
            SELECT user_id, epoch_us(ts) AS t_us, event_id,
                   CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) > 3600000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events))
        GROUP BY user_id, sess_id)
      GROUP BY user_id ORDER BY user_id""")
  )

  /** Time-series resampling with gap FILLING (data densification): each
    * user's event counts on a complete hourly grid, zero-filled where no
    * events fell — the regularization step ahead of any windowed model
    * or charting, and the operator `groupBy(bucket)` alone cannot express
    * (missing buckets simply don't exist in its output; q14 shows that
    * form).
    *
    * Plan shape at 100 TB: the spine is `sequence(lo, hi)` off a 1-row
    * global bounds aggregate — generated, never scanned — and broadcasts
    * into the users × spine grid; actual counts left-join the grid on
    * (user, bucket). The fact table is touched twice (bounds + counts),
    * both single-aggregate passes.
    */
  val q24Resample: QueryDef = QueryDef(
    "q24_resample",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id") < 20)
        .withColumn("hr", expr(s"ts div ${NsPerHour}L"))
      val spine = ev.agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(spine))
      val counts = ev.groupBy("user_id", "hr").agg(count(lit(1)).as("n_raw"))
      grid.join(counts, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          coalesce(col("n_raw"), lit(0L)).as("n"))
        .orderBy("user_id", "hr")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) // ${NsPerHour} AS hr
        FROM events WHERE user_id < 20),
      b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM ev),
      spine AS (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS hr FROM b),
      users AS (SELECT DISTINCT user_id FROM ev),
      c AS (SELECT user_id, hr, COUNT(*) AS n FROM ev GROUP BY 1, 2)
      SELECT u.user_id, s.hr, COALESCE(c.n, 0) AS n
      FROM users u CROSS JOIN spine s
      LEFT JOIN c ON c.user_id = u.user_id AND c.hr = s.hr
      ORDER BY u.user_id, s.hr""")
  )

  /** Ranking-function family (rank / dense_rank / ntile / percent_rank —
    * q7 covers row_number + running sums): orders ranked by total price
    * within their priority class, plus decile assignment. One shuffle on
    * the partition key; percent_rank's `(rank-1)/(n-1)` divides
    * identically on both engines.
    */
  val q25Ranks: QueryDef = QueryDef(
    "q25_ranks",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(10).over(w).as("decile"),
          percent_rank().over(w).as("prank"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(10) OVER w AS decile,
             PERCENT_RANK() OVER w AS prank
      FROM orders WHERE o_orderkey <= 2000
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey""")
  )

  /** RANGE-frame (time-based) sliding window: per user, the trailing
    * 1-hour event count and value sum at every event — the "activity in
    * the last hour" shape that ROWS frames cannot express when events are
    * irregular. The frame is on the µs epoch (ns div 1000, exact
    * integers); rows with EQUAL timestamps are frame peers and aggregate
    * identically in both engines. The sliding SUM takes the decimal
    * detour (Exact): Spark recomputes frames while DuckDB segment-trees
    * them — different double accumulation orders — and decimal addition
    * is associative, so the result is bit-identical anyway. One keyed
    * shuffle; frame evaluation is a per-partition linear sweep.
    */
  val q30RangeWindow: QueryDef = QueryDef(
    "q30_range_window",
    (s, dir) => {
      val usPerHour = 3600L * 1000L * 1000L
      val w = Window.partitionBy("user_id").orderBy("t_us")
        .rangeBetween(-usPerHour, 0)
      Tables.load(s, dir, "events")
        .filter(col("user_id") <= 75)
        .withColumn("t_us", expr("ts div 1000L"))
        .select(col("event_id"), col("user_id"), col("t_us"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 4)))
            .over(w).cast(DoubleType))
        .orderBy("user_id", "t_us", "event_id")
    },
    Some(s"""
      SELECT event_id, user_id, epoch_us(ts) AS t_us, value,
        COUNT(*) OVER w AS n_1h,
        CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE) AS sum_1h
      FROM events WHERE user_id <= 75
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, t_us, event_id""")
  )

  /** EXACT heavy hitters via Count-Min prefilter + exact recount
    * ([[graft.core.HeavyHitters]]): every key whose count is ≥ 1% of the
    * table, with its exact count. The CMS probe never undercounts, so the
    * prefilter keeps every truly-heavy key and the recount makes the
    * result IDENTICAL to the plain GROUP BY / HAVING oracle — the sketch
    * only prunes the shuffle (cold keys never cross the exchange).
    *
    * The harness key distributions are near-uniform (no key reaches 1%),
    * so like t15's planted PII the query PLANTS deterministic skew: 30%
    * of events hash into 5 hot keys, the rest keep unique keys — without
    * that, heavy-hitter mining would verify vacuously. The threshold is
    * data-derived (total/100), so the selection stays meaningful at any
    * scale factor.
    */
  val q32HeavyHitters: QueryDef = QueryDef(
    "q32_heavy_hitters",
    (s, dir) => {
      val keyed = Tables.load(s, dir, "events")
        .select(when(pmod(col("event_id"), lit(10)) < 3,
          pmod(col("user_id"), lit(5)))
          .otherwise(col("event_id") + 1000000L).as("k"))
      graft.core.HeavyHitters.exact(keyed, "k", total => total / 100)
        .orderBy("k")
    },
    Some("""
      WITH k AS (
        SELECT CASE WHEN event_id % 10 < 3 THEN user_id % 5
                    ELSE event_id + 1000000 END AS k
        FROM events),
      g AS (SELECT COUNT(*) // 100 AS thr FROM k)
      SELECT k, COUNT(*) AS n FROM k
      GROUP BY k HAVING COUNT(*) >= (SELECT thr FROM g)
      ORDER BY k""")
  )

  /** Incremental aggregate maintenance — the materialized-view contract:
    * the rollup over (history ∪ batch) is computed by MERGING the
    * history's partial aggregate state with the batch's, never rescanning
    * history. Every statistic here is a commutative-monoid merge (count →
    * sum, decimal sum → sum, min → min, max → max; t9 does the same for
    * distinct-count sketches), so merged-state results are EXACTLY the
    * full recompute — which is precisely what the oracle runs (one flat
    * GROUP BY over everything). At 100 TB this is the difference between
    * touching a day of data and touching the corpus on every refresh; in
    * production the history partials are read back from the stored state
    * table rather than derived in-plan as they are here. The decimal
    * detour makes the double sums associative, so merge order cannot
    * perturb them. History/batch split is a deterministic 70/30 id hash
    * (the time axis is irrelevant to the merge law).
    */
  val q34IncrementalRollup: QueryDef = QueryDef(
    "q34_incremental_rollup",
    (s, dir) => {
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 4))).as("sv"),
          min(col("value")).as("mn"),
          max(col("value")).as("mx"))
      val ev = Tables.load(s, dir, "events")
      val history = partials(ev.filter(pmod(col("event_id"), lit(10)) < 7))
      val batch = partials(ev.filter(pmod(col("event_id"), lit(10)) >= 7))
      history.unionByName(batch)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
          min(col("mn")).as("min_value"), max(col("mx")).as("max_value"))
        .select(col("event_type"), col("n"),
          col("sv").cast(DoubleType).as("total_value"),
          col("min_value"), col("max_value"),
          (col("sv").cast(DoubleType) / col("n")).as("mean_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value,
             MIN(value) AS min_value, MAX(value) AS max_value,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS mean_value
      FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** SCD Type-2 dimension build — gaps-and-islands: per user, collapse
    * consecutive observation days with the SAME attribute value into one
    * validity row [valid_from, valid_to]. The island id is the classic
    * change-flag running sum (one lag + one cumulative sum over the same
    * keyed window — a single shuffle on user_id), then one groupBy per
    * island. The attribute is derived deterministically from (user, day)
    * so runs exist by construction; integers end to end, so the oracle
    * replays the identical windows. This is how a warehouse derives
    * slowly-changing dimensions from an event log at any scale — state
    * never leaves the user's partition.
    */
  val q35Scd2: QueryDef = QueryDef(
    "q35_scd2",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("day")
      val days = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div (86400000000000L)").as("day"))
        .distinct()
        .withColumn("attr", (expr("day div 5") + col("user_id")) % 3)
      days
        .withColumn("changed",
          when(lag(col("attr"), 1).over(byUser).isNull ||
            lag(col("attr"), 1).over(byUser) =!= col("attr"), 1L).otherwise(0L))
        .withColumn("island", sum(col("changed")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(first(col("attr")).as("attr"), min(col("day")).as("valid_from"),
          max(col("day")).as("valid_to"), count(lit(1)).as("n_days"))
        .select("user_id", "attr", "valid_from", "valid_to", "n_days")
        .orderBy("user_id", "valid_from")
    },
    Some("""
      WITH d AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        FROM events),
      a AS (SELECT user_id, day, (day // 5 + user_id) % 3 AS attr FROM d),
      c AS (SELECT user_id, day, attr,
                   CASE WHEN LAG(attr) OVER w IS NULL
                          OR LAG(attr) OVER w != attr THEN 1 ELSE 0 END AS changed
            FROM a WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      i AS (SELECT user_id, day, attr,
                   SUM(changed) OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM c)
      SELECT user_id, attr, MIN(day) AS valid_from, MAX(day) AS valid_to,
             COUNT(*) AS n_days
      FROM i GROUP BY user_id, island, attr
      ORDER BY user_id, valid_from""")
  )

  /** The SAME as-of semantics as q16, but through the custom
    * whole-operator plan ([[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfJoinExec]] via the injected planner strategy):
    * each side shuffles/sorts once on its OWN (key, time) and a linear
    * per-partition merge with O(1) state replaces the union + window —
    * verified against the identical DuckDB ASOF oracle, so the custom
    * physical operator is value-checked end to end by the driver.
    */
  val q36AsofExec: QueryDef = QueryDef(
    "q36_asof_exec",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("ct"),
          col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      graft.plans.AsOf.lastBefore(clicks, purchases,
        "cu", "ct", "click_id", "user_id", "ts")
        .filter(col("click_id").isNotNull)
        .select(col("purchase_id"), col("user_id"),
          expr("ts div 1000").as("t_purchase_us"),
          col("click_id"),
          expr("ct div 1000").as("t_click_us"),
          ((expr("ts div 1000") - expr("ct div 1000")).cast(DoubleType) /
            lit(1000000.0)).as("wait_sec"))
        .orderBy("purchase_id")
    },
    Some("""
      SELECT purchase_id, user_id, t_purchase_us, click_id, t_click_us,
             CAST(t_purchase_us - t_click_us AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS wait_sec
      FROM (
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_us(p.ts) AS t_purchase_us,
               c.event_id AS click_id, epoch_us(c.ts) AS t_click_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts)
      WHERE rn = 1
      ORDER BY purchase_id""")
  )

  /** Multi-step funnel analysis — signup → first click AFTER signup →
    * first purchase AFTER that click, per user: the sequential-dependency
    * aggregation product analytics runs everywhere. Three stacked
    * whole-partition window minimums (each conditioned on the previous
    * stage's time) share ONE hash partitioning on user_id, so the plan
    * shuffles once and evaluates the stages in-partition; null
    * propagation (`ts > NULL` → filtered) encodes "never reached the
    * previous stage" identically on both engines, and all comparisons
    * are ns-integer exact.
    */
  val q37Funnel: QueryDef = QueryDef(
    "q37_funnel",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t0",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .withColumn("t1",
          min(when(col("event_type") === "click" && col("ts") > col("t0"),
            col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "purchase" && col("ts") > col("t1"),
            col("ts"))).over(w))
        .select(col("user_id"),
          expr("t0 div 1000").as("t_signup_us"),
          expr("t1 div 1000").as("t_click_us"),
          expr("t2 div 1000").as("t_purchase_us"),
          when(col("t2").isNotNull, 3).when(col("t1").isNotNull, 2)
            .when(col("t0").isNotNull, 1).otherwise(0).as("stage"))
        .distinct()
        .orderBy("user_id")
    },
    Some("""
      WITH f AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      a AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END)
                        OVER (PARTITION BY user_id) AS t0 FROM f),
      b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
                        OVER (PARTITION BY user_id) AS t1 FROM a),
      c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
                        OVER (PARTITION BY user_id) AS t2 FROM b)
      SELECT DISTINCT user_id,
             t0 // 1000 AS t_signup_us,
             t1 // 1000 AS t_click_us,
             t2 // 1000 AS t_purchase_us,
             CASE WHEN t2 IS NOT NULL THEN 3
                  WHEN t1 IS NOT NULL THEN 2
                  WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS stage
      FROM c ORDER BY user_id""")
  )

  /** Cohort retention — the growth-analytics matrix: users cohort by
    * first-activity day, and each (cohort, day-offset) cell counts how
    * many of them were active that many days later. Three aggregates
    * sharing the user_id / cohort keys (distinct activity days → per-user
    * cohort → per-cell counts), one broadcast of the cohort sizes;
    * retention is one double division with both operands exact integers.
    */
  val q40Retention: QueryDef = QueryDef(
    "q40_retention",
    (s, dir) => {
      val days = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000L").as("day"))
        .distinct()
      val cohorts = days.groupBy("user_id").agg(min(col("day")).as("c"))
      val sizes = cohorts.groupBy("c").agg(count(lit(1)).as("n_cohort"))
      days.join(cohorts, Seq("user_id"))
        .withColumn("day_offset", col("day") - col("c"))
        .filter(col("day_offset") <= 6)
        .groupBy("c", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), Seq("c"))
        .withColumn("retention",
          col("n_active").cast(DoubleType) / col("n_cohort").cast(DoubleType))
        .select(col("c").as("cohort_day"), col("day_offset"), col("n_active"),
          col("n_cohort"), col("retention"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        FROM events),
      cohorts AS (SELECT user_id, MIN(day) AS c FROM days GROUP BY user_id),
      sizes AS (SELECT c, COUNT(*) AS n_cohort FROM cohorts GROUP BY c)
      SELECT d.c AS cohort_day, d.day_offset, d.n_active, s.n_cohort,
             CAST(d.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS retention
      FROM (
        SELECT co.c, days.day - co.c AS day_offset,
               COUNT(DISTINCT days.user_id) AS n_active
        FROM days JOIN cohorts co USING (user_id)
        WHERE days.day - co.c <= 6
        GROUP BY co.c, days.day - co.c) d
      JOIN sizes s USING (c)
      ORDER BY cohort_day, day_offset""")
  )

  /** Interval-overlap aggregation (peak concurrency per hour) via a
    * SWEEP-LINE, not a self-join: each event becomes an interval
    * [ts, ts + 60·value seconds), intervals become ±1 deltas at their
    * endpoints, and concurrency is the running sum of deltas in global
    * (t, d, event_id) order (ends sort before starts at equal t —
    * end-exclusive semantics). A naive interval × hour-grid join is
    * quadratic in overlap; the sweep is one union + one running sum.
    *
    * The global running sum is NOT computed with one ungrouped window
    * (single reducer at 100 TB). Same two-pass discipline as
    * [[graft.core.Ranks]]: (1) per-hour net delta — a tiny aggregate,
    * |hours| rows — turns into exclusive prefix offsets (window over the
    * aggregate, not the data); (2) the within-hour running sum is a
    * window PARTITIONED BY hour, fully parallel across hours, plus the
    * broadcast offset. Carry-over across hour boundaries is exactly the
    * offset term, so intervals spanning many hours (value ≤ 490 min
    * here) are handled without densification.
    */
  val q49Concurrency: QueryDef = QueryDef(
    "q49_concurrency",
    (s, dir) => {
      // µs, not ns: DuckDB reads the parquet ns timestamps at µs
      // precision, so every cross-engine time value truncates to µs first
      val iv = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("t0"), col("value"))
        .withColumn("t1", col("t0") +
          floor(col("value") * 60.0).cast("long") * 1000000L + 1L)
      val deltas = iv.select(col("t0").as("t"), lit(1L).as("d"), col("event_id"))
        .unionAll(iv.select(col("t1").as("t"), lit(-1L).as("d"),
          col("event_id")))
        .withColumn("hour", expr("t div 3600000000L"))
      val wOff = Window.orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = deltas.groupBy("hour").agg(sum("d").as("net"))
        .withColumn("off", coalesce(sum("net").over(wOff), lit(0L)))
        .select("hour", "off")
      val wIn = Window.partitionBy("hour").orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas.join(broadcast(offsets), Seq("hour"))
        .withColumn("conc", col("off") + sum("d").over(wIn))
        .groupBy("hour")
        .agg(max("conc").as("max_conc"),
          sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"))
        .orderBy("hour")
    },
    Some(s"""
      WITH iv AS (
        SELECT event_id, epoch_us(ts) AS t0,
               epoch_us(ts) + CAST(FLOOR(value * 60.0) AS BIGINT) * 1000000
                 + 1 AS t1
        FROM events),
      d AS (
        SELECT t0 AS t, 1 AS d, event_id FROM iv
        UNION ALL
        SELECT t1 AS t, -1 AS d, event_id FROM iv),
      r AS (
        SELECT t // 3600000000 AS hour, d,
               SUM(d) OVER (ORDER BY t, d, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM d)
      SELECT hour, CAST(MAX(conc) AS BIGINT) AS max_conc,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
      FROM r GROUP BY hour ORDER BY hour""")
  )

  /** Last-touch marketing attribution: every purchase is credited to the
    * user's most recent click/view strictly before it and within a 7-day
    * lookback, else 'direct'. The carry is `last(..., ignoreNulls)` over
    * a per-user window ending at 1 PRECEDING — the running "latest touch"
    * travels with the event stream, so no purchases × touches join
    * exists at all (the naive formulation; quadratic per user).
    * Deterministic: the window total-orders on (ts, event_id).
    *
    * At 100 TB the window partitions by user_id — parallel across the
    * key, one shuffle — and the final rollup is a 3-row aggregate.
    * Revenue sums ride the 2-decimal money detour ([[graft.core.Exact]])
    * so channel totals are partitioning-independent.
    */
  val q50Attribution: QueryDef = QueryDef(
    "q50_attribution",
    (s, dir) => {
      val lookbackUs = 7L * 24L * 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // µs-truncated time (the cross-engine precision; see q49)
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_type"), col("value"))
      val touched = ev
        .withColumn("lt_type",
          last(when(col("event_type").isin("click", "view"),
            col("event_type")), ignoreNulls = true).over(w))
        .withColumn("lt_ts",
          last(when(col("event_type").isin("click", "view"), col("t_us")),
            ignoreNulls = true).over(w))
      touched.filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("lt_ts").isNotNull &&
            col("t_us") - col("lt_ts") <= lookbackUs, col("lt_type"))
            .otherwise(lit("direct")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n"),
          Exact.dsumScaled(money(col("value")), 2).as("revenue"))
        .orderBy("channel")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS t, event_type, value
        FROM events),
      carried AS (
        SELECT *,
               LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                   THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
               LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                   THEN t END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts
        FROM ev)
      SELECT CASE WHEN lt_ts IS NOT NULL
                    AND t - lt_ts <= ${7L * 24L * 3600L * 1000000L}
                  THEN lt_type ELSE 'direct' END AS channel,
             COUNT(*) AS n,
             CAST(SUM(${sqlMoney("value")}) AS DOUBLE) AS revenue
      FROM carried WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1""")
  )

  /** Sliding DISTINCT-count (trailing 3-hour active users per hour) —
    * the aggregate a window frame cannot express natively (Spark rejects
    * DISTINCT aggregates over windows; `collect_set().over(w)` builds
    * the whole set per row). Re-expressed as COVERAGE FAN-OUT: each
    * distinct (user, hour) pair votes for the 3 hour-buckets whose
    * trailing window it falls in, then one distinct + one count per
    * target hour. At 100 TB that is two keyed aggregations over 3× the
    * distinct-pair count — map-side combinable, no per-row set state,
    * no self-join of the event table against the bucket spine. Hours
    * with activity only in their trailing tail still appear (the vote
    * lands on them); hours with no coverage at all are absent in both
    * engines.
    */
  val q53SlidingDistinct: QueryDef = QueryDef(
    "q53_sliding_distinct",
    (s, dir) => {
      val pairs = Tables.load(s, dir, "events")
        .select(col("user_id"), expr(s"ts div ${NsPerHour}L").as("hr"))
        .distinct()
      pairs
        .select(col("user_id"), col("hr"),
          explode(sequence(col("hr"), col("hr") + 2)).as("t_hr"))
        .select(col("user_id"), col("t_hr")).distinct()
        .groupBy("t_hr")
        .agg(count(lit(1)).as("active_users_3h"))
        .orderBy("t_hr")
    },
    Some(s"""
      WITH pairs AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // ${NsPerHour} AS hr
        FROM events),
      votes AS (
        SELECT DISTINCT user_id, hr + o AS t_hr
        FROM pairs, (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS o))
      SELECT t_hr, COUNT(*) AS active_users_3h
      FROM votes GROUP BY t_hr ORDER BY t_hr""")
  )

  /** TIME-WEIGHTED average over irregular samples — the sensor/financial
    * aggregate a plain AVG gets wrong: each reading holds until the next
    * one, so its weight is the holding duration, TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ
    * (the trailing unclosed hold contributes nothing; documented
    * semantics mirrored by the oracle). Exactness: values are exact
    * cents (×100 through the money decimal), durations are integer
    * MILLIseconds (ns div 1e6 — coarse enough that cents×ms×|events|
    * stays far inside BIGINT at any realistic per-key density), so both
    * numerator and denominator are order-free integer sums and the final
    * TWA is the same two IEEE ops on both engines.
    *
    * Scale: one user-keyed window (lead) + one grouped integer
    * aggregate — single shuffle, map-side combinable.
    */
  val q55TimeWeighted: QueryDef = QueryDef(
    "q55_time_weighted",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("t_us"),
          col("event_id"),
          (money(col("value")) * lit(100)).cast("long").as("cents"))
        .withColumn("nxt", lead("t_us", 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("dt_ms", expr("(nxt - t_us) div 1000L"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_holds"),
          sum(col("cents") * col("dt_ms")).as("num"),
          sum(col("dt_ms")).as("den"))
        .select(col("user_id"), col("n_holds"), col("num"), col("den"),
          (col("num").cast(DoubleType) / col("den").cast(DoubleType) /
            lit(100.0)).as("twa"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH h AS (
        SELECT user_id,
               CAST(${sqlMoney("value")} * 100 AS BIGINT) AS cents,
               (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id) - epoch_us(ts))
                 // 1000 AS dt_ms
        FROM events)
      SELECT user_id, COUNT(*) AS n_holds,
             CAST(SUM(cents * dt_ms) AS BIGINT) AS num,
             CAST(SUM(dt_ms) AS BIGINT) AS den,
             CAST(SUM(cents * dt_ms) AS DOUBLE)
               / CAST(SUM(dt_ms) AS DOUBLE) / 100.0 AS twa
      FROM h WHERE dt_ms IS NOT NULL
      GROUP BY user_id ORDER BY user_id""")
  )

  /** Time-series GAP FILL with linear interpolation — q24 builds the
    * dense hourly spine; this fills the VALUE channel the way a feature
    * pipeline needs it: observed hours keep their reading, interior gaps
    * interpolate linearly between the bracketing observations, and the
    * edges forward-/backward-fill. Neighbor access is two user-keyed
    * windows (ignore-nulls last/first — the q50 carry idiom), so the
    * plan is one shuffle on user_id at any scale; the spine explode is
    * per-user-bounded. Exactness: readings are integer cents (selection
    * max per hour), gaps are integer hour deltas, and the interpolation
    * `(Δc)·(Δh)/(ΔH) + c_prev` is the same four IEEE ops on both
    * engines over exactly-representable integers.
    */
  val q59GapFill: QueryDef = QueryDef(
    "q59_gap_fill",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id") < 20)
        .withColumn("hr", expr(s"ts div ${NsPerHour}L"))
        .withColumn("cents", (money(col("value")) * 100).cast("long"))
      // known is bounded by users × hours (tiny against the event log);
      // materializing it lets the spine bounds, the user list and the
      // left join below all read ONE events scan instead of three —
      // its hr/user extents equal ev's by construction (grouping drops
      // no user and no hour)
      val known = ev.groupBy("user_id", "hr").agg(max(col("cents")).as("c"))
        .localCheckpoint(eager = true)
      val spine = known.agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
      val grid = known.select("user_id").distinct()
        .crossJoin(broadcast(spine))
      val wPrev = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(known, Seq("user_id", "hr"), "left")
        .withColumn("pc", last(col("c"), ignoreNulls = true).over(wPrev))
        .withColumn("phr", last(when(col("c").isNotNull, col("hr")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nc", first(col("c"), ignoreNulls = true).over(wNext))
        .withColumn("nhr", first(when(col("c").isNotNull, col("hr")),
          ignoreNulls = true).over(wNext))
        .select(col("user_id"), col("hr"),
          when(col("c").isNotNull, col("c").cast("double"))
            .when(col("pc").isNotNull && col("nc").isNotNull,
              (col("nc") - col("pc")).cast("double") *
                (col("hr") - col("phr")).cast("double") /
                (col("nhr") - col("phr")).cast("double") +
                col("pc").cast("double"))
            .when(col("pc").isNotNull, col("pc").cast("double"))
            .otherwise(col("nc").cast("double")).as("cents_filled"),
          when(col("c").isNotNull, lit("obs"))
            .when(col("pc").isNotNull && col("nc").isNotNull, lit("interp"))
            .when(col("pc").isNotNull, lit("ffill"))
            .otherwise(lit("bfill")).as("src"))
        .orderBy("user_id", "hr")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) // ${NsPerHour} AS hr,
               CAST(${sqlMoney("value")} * 100 AS BIGINT) AS cents
        FROM events WHERE user_id < 20),
      b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM ev),
      spine AS (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS hr FROM b),
      users AS (SELECT DISTINCT user_id FROM ev),
      known AS (SELECT user_id, hr, MAX(cents) AS c FROM ev GROUP BY 1, 2),
      g AS (
        SELECT u.user_id, s.hr, k.c,
          last_value(k.c IGNORE NULLS) OVER (
            PARTITION BY u.user_id ORDER BY s.hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
          last_value(CASE WHEN k.c IS NOT NULL THEN s.hr END IGNORE NULLS)
            OVER (PARTITION BY u.user_id ORDER BY s.hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phr,
          first_value(k.c IGNORE NULLS) OVER (
            PARTITION BY u.user_id ORDER BY s.hr
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
          first_value(CASE WHEN k.c IS NOT NULL THEN s.hr END IGNORE NULLS)
            OVER (PARTITION BY u.user_id ORDER BY s.hr
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nhr
        FROM users u CROSS JOIN spine s
        LEFT JOIN known k ON k.user_id = u.user_id AND k.hr = s.hr)
      SELECT user_id, hr,
        CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
             WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
               CAST(nc - pc AS DOUBLE) * CAST(hr - phr AS DOUBLE)
                 / CAST(nhr - phr AS DOUBLE) + CAST(pc AS DOUBLE)
             WHEN pc IS NOT NULL THEN CAST(pc AS DOUBLE)
             ELSE CAST(nc AS DOUBLE) END AS cents_filled,
        CASE WHEN c IS NOT NULL THEN 'obs'
             WHEN pc IS NOT NULL AND nc IS NOT NULL THEN 'interp'
             WHEN pc IS NOT NULL THEN 'ffill'
             ELSE 'bfill' END AS src
      FROM g ORDER BY user_id, hr""")
  )

  /** MAD robust anomaly detection (median absolute deviation): per
    * event type, med = median(value), MAD = median(|value − med|), and
    * an anomaly count at the classic 3·MAD cut — the outlier detector
    * that, unlike mean/σ (f7's z-scores), is not itself dragged by the
    * outliers it hunts.
    *
    * Exactness: values are 2-decimal money, scaled to HALF-cent integers
    * (c2 = value·200) so every median — a midpoint of two integers — and
    * every deviation is a dyadic rational, bit-exact under any formula
    * on both engines; the only non-dyadic step is the final single /200
    * display division, one IEEE op on both sides.
    *
    * Scale: value is 2-decimal money in [0, 1000], so the half-cent
    * grid c2 = value·200 has a DOMAIN-bounded support — ≤ 200,001
    * distinct cells per event type at ANY corpus size. Both medians
    * therefore come from ONE (type, c2) frequency aggregate (map-side
    * combined; the only pass over the fact table): a running-count
    * window over the tiny frequency table locates the two target order
    * statistics per type (the value at rank r is the first cell whose
    * cumulative count reaches r), the deviation distribution is the
    * frequency table re-keyed by |c2 − med| (never the fact rows), and
    * the anomaly count is a frequency-weighted sum. Every exchange
    * after the scan moves ≤ |domain|·|types| rows — state bounded by
    * the DOMAIN, not the data, which is what lets the per-type window
    * hold at 100 TB where a per-row rank window would collapse one
    * type onto one reducer. (Contrast q31/q47: l_extendedprice is
    * data-bounded — hundreds of thousands of distinct values and
    * growing with sf — so they keep the orderStatistics counts-pass
    * discipline instead.)
    */
  val q57MadAnomaly: QueryDef = QueryDef(
    "q57_mad_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          (money(col("value")) * 200).cast("long").as("c2"))
      val freq = ev.groupBy("event_type", "c2").agg(count(lit(1)).as("cnt"))
      // exact median of the distribution {v: weight cnt}: the mean of the
      // order statistics at ranks (n+1)//2 and (n+2)//2 — bit-equal to
      // the oracle's SUM/COUNT over the two ROW_NUMBER targets (integer-
      // valued doubles; the midpoint of equal values is the value).
      // Shared compressed-domain helper (g6 uses the same walk).
      def medianFromFreq(f: DataFrame, v: String, out: String): DataFrame =
        graft.core.Ranks.medianFromFreq(f, "event_type", v, "cnt", out)
      val med = medianFromFreq(freq, "c2", "med2")
      val devFreq = freq.join(broadcast(med), Seq("event_type"))
        .withColumn("dev2", abs(col("c2").cast("double") - col("med2")))
        .groupBy("event_type", "dev2")
        .agg(sum(col("cnt")).as("cnt"), max(col("med2")).as("med2"))
      val mad = medianFromFreq(devFreq, "dev2", "mad2")
      devFreq.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n"),
          (max(col("med2")) / 200.0).as("med"),
          (max(col("mad2")) / 200.0).as("mad"),
          sum(when(col("dev2") > lit(3.0) * col("mad2"), col("cnt"))
            .otherwise(0L)).as("n_anomalies"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH e AS (
        SELECT event_type,
               CAST(${sqlMoney("value")} * 200 AS BIGINT) AS c2
        FROM events),
      r1 AS (
        SELECT event_type, c2, CAST(c2 AS DOUBLE) AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c2) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM e),
      med AS (
        SELECT event_type, SUM(v) / COUNT(*) AS med2, ANY_VALUE(n) AS n
        FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY event_type),
      d AS (
        SELECT e.event_type, ABS(e.c2 - m.med2) AS dev2, m.med2, m.n
        FROM e JOIN med m USING (event_type)),
      r2 AS (
        SELECT event_type, dev2, med2, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2) AS rn
        FROM d),
      mad AS (
        SELECT event_type, SUM(dev2) / COUNT(*) AS mad2
        FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY event_type)
      SELECT d.event_type, CAST(ANY_VALUE(d.n) AS BIGINT) AS n,
             ANY_VALUE(d.med2) / 200.0 AS med,
             ANY_VALUE(mad.mad2) / 200.0 AS mad,
             CAST(SUM(CASE WHEN d.dev2 > 3.0 * mad.mad2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_anomalies
      FROM d JOIN mad USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type""")
  )

  /** Literal epoch-range slice (SURVEY §2 B1/E8 + the scan-pruning tier):
    * one week of a month-long event log, aggregated per type. The filter
    * is on the NORMALIZED ns-long `ts`, i.e. a derived column — without
    * [[graft.plans.TsRangePushdown]] the parquet scan reads every row
    * group of a time-organized table; with it the bounds reach the footer
    * as raw-column predicates (TsRangePushdownSpec pins `PushedFilters`).
    * At 100 TB this is THE pruning shape: a day/week slice of a
    * time-partitioned event store should cost proportional to the slice.
    */
  val q62TimeSlice: QueryDef = {
    val lo = 1_704_672_000_000_000_000L // 2024-01-08T00:00:00Z (ns)
    val hi = 1_705_276_800_000_000_000L // 2024-01-15T00:00:00Z (ns)
    QueryDef(
      "q62_time_slice",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(col("ts") >= lo && col("ts") < hi)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            Exact.dsumScaled(money(col("value")), 2).as("total_value"),
            countDistinct(col("user_id")).as("users"))
          .orderBy("event_type"),
      Some(s"""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(${sqlMoney("value")}) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS users
        FROM events
        WHERE epoch_ns(ts) >= $lo AND epoch_ns(ts) < $hi
        GROUP BY 1 ORDER BY 1""")
    )
  }

  val all: Seq[QueryDef] = Seq(
    q7WindowRunning, q8PivotCounts, q9EventPairs,
    q14TimeBuckets, q15UserSpan, q16AsofJoin, q17JsonExtract, q21Sessions,
    q24Resample, q25Ranks, q30RangeWindow, q32HeavyHitters,
    q34IncrementalRollup, q35Scd2, q36AsofExec, q37Funnel, q40Retention,
    q44Variant, q45Trending, q49Concurrency, q50Attribution,
    q53SlidingDistinct, q55TimeWeighted, q57MadAnomaly, q59GapFill,
    q62TimeSlice)
}
