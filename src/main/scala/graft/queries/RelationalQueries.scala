package graft.queries

import graft.QueryDef
import graft.core.{Exact, Tables}
import org.apache.spark.sql.functions._

/** Core relational surface: grouped aggregation, filter+sort+limit, joins.
  *
  * Generalizes the reference's global pandas aggregates
  * (/root/reference/picoprobe/flow_analyzer.py:121-152 — mean/min/max/
  * median/std over runtime columns) to grouped, distributed form, per
  * SURVEY.md §2 C. Scale notes inline per query.
  */
object RelationalQueries {

  import Exact.{davg, dsum, money, sqlAvg, sqlMoney, sqlSum}
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  /** TPC-H Q1 shape: scan-side filter (pushed to parquet), map-side partial
    * aggregation, tiny shuffle (|groups| = 6). Scales linearly at 100 TB —
    * the shuffle carries one row per (partition × group). Products are done
    * in decimal space (money columns are exactly 2-decimal) so the sums are
    * exact and partitioning-independent.
    */
  val q1Agg: QueryDef = QueryDef(
    "q1_agg",
    (s, dir) => {
      // money products in pure LONG units (r15 optimization): the cent
      // units of each factor round through the same Decimal(18,2) cast
      // as before, but the per-row product is a long multiply instead of
      // a precision-37 Decimal multiply — identical scaled integers,
      // identical split-long sums (Exact.dsumUnits doc), ~no allocation
      // per row
      val disc4 = Exact.moneyUnits(col("l_extendedprice")) *
        Exact.moneyUnits(lit(1.0) - col("l_discount"))
      val charge6 = disc4 * Exact.moneyUnits(lit(1.0) + col("l_tax"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsumUnits(disc4, 4).as("sum_disc_price"),
          Exact.dsumUnits(charge6, 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity")} AS sum_qty,
        ${sqlSum("l_extendedprice")} AS sum_base_price,
        CAST(SUM(${sqlMoney("l_extendedprice")} * ${sqlMoney("1.0 - l_discount")}) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(${sqlMoney("l_extendedprice")} * ${sqlMoney("1.0 - l_discount")} AS DECIMAL(18,4)) * ${sqlMoney("1.0 + l_tax")}) AS DOUBLE) AS sum_charge,
        ${sqlAvg("l_quantity")} AS avg_qty,
        ${sqlAvg("l_extendedprice")} AS avg_price,
        ${sqlAvg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  )

  /** Filter + sort + limit (SURVEY §2 B1/B2/E6/E7): top-k by price.
    * At scale: Spark plans this as a per-partition TakeOrderedAndProject —
    * no global sort, only k rows reach the driver-side merge.
    */
  val q2TopK: QueryDef = QueryDef(
    "q2_topk",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")
  )

  /** Histogram (SURVEY §2 C9, flow_analyzer.py:370 `plot.hist(bins=20)`):
    * global min/max (one tiny agg, broadcast) then a 20-bucket groupBy.
    * Two scans at 100 TB, both columnar + pushed-down to one column.
    */
  val q10Histogram: QueryDef = QueryDef(
    "q10_histogram",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val mm = o.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(mm))
        .withColumn(
          "bucket",
          least(floor((col("o_totalprice") - col("mn")) * 20.0 / (col("mx") - col("mn"))), lit(19.0)).cast("long"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },
    Some("""
      WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
      SELECT LEAST(CAST(FLOOR((o_totalprice - mn) * 20.0 / (mx - mn)) AS BIGINT), 19) AS bucket,
             COUNT(*) AS n
      FROM orders, b GROUP BY 1 ORDER BY 1""")
  )

  /** describe()-style stats (SURVEY §2 C2/C6): count/mean/std/min/max/median
    * per group. Stddev via the exact sum/sum-of-squares identity so the
    * result is partitioning-independent (quantities are integer-valued).
    */
  val q11SummaryStats: QueryDef = QueryDef(
    "q11_summary_stats",
    (s, dir) => {
      val q   = col("l_quantity")
      val n   = count(lit(1))
      val sm  = dsum(q)
      val sq  = dsum(q * q)
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          n.as("n"),
          (sm / n).as("mean_qty"),
          sqrt((sq - sm * sm / n) / (n - lit(1))).as("std_qty"),
          min(q).as("min_qty"),
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          max(q).as("max_qty"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
        COUNT(*) AS n,
        ${sqlSum("l_quantity")} / COUNT(*) AS mean_qty,
        SQRT((${sqlSum("l_quantity * l_quantity")} - ${sqlSum("l_quantity")} * ${sqlSum("l_quantity")} / COUNT(*)) / (COUNT(*) - 1)) AS std_qty,
        MIN(l_quantity) AS min_qty,
        quantile_cont(l_quantity, 0.5) AS p50_qty,
        MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Distinct values (SURVEY §2 C8, `np.unique(df["message"])`). */
  val q12Distinct: QueryDef = QueryDef(
    "q12_distinct",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select("event_type").distinct().orderBy("event_type"),
    Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")
  )

  /** String-function surface (SURVEY §2 B8/F: path mapping, suffix swap,
    * label formatting — utils.py:45-77, tools/hyperspectral.py:127,139).
    * Pure per-row projection: narrow scan, whole-stage codegen, no shuffle.
    */
  val q13StringFuncs: QueryDef = QueryDef(
    "q13_string_funcs",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          expr("replace(p_name, ' ', '_')").as("name_snake"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          expr("split_part(p_name, ' ', 1)").as("first_word"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pre"),
          expr("replace(concat(replace(p_name, ' ', '-'), '.emd'), '.emd', '.json')").as("sidecar"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        UPPER(p_name) AS name_upper,
        REPLACE(p_name, ' ', '_') AS name_snake,
        CONCAT(p_brand, '-', p_type) AS brand_type,
        SPLIT_PART(p_name, ' ', 1) AS first_word,
        LENGTH(p_name) AS name_len,
        SUBSTRING(p_name, 1, 5) AS name_pre,
        REPLACE(CONCAT(REPLACE(p_name, ' ', '-'), '.emd'), '.emd', '.json') AS sidecar
      FROM part ORDER BY p_partkey""")
  )

  /** ROLLUP hierarchy aggregation (subtotals + grand total in one pass —
    * Spark expands grouping sets in a single aggregate, one shuffle).
    * NULL grouping keys are COALESCEd to a sentinel before the sort:
    * Spark orders NULLS FIRST, DuckDB NULLS LAST, so raw null ordering
    * would hash-mismatch; grouping_id disambiguates real vs subtotal rows.
    */
  val q18Rollup: QueryDef = QueryDef(
    "q18_rollup",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy("gid", "rf", "ls"),
    Some(s"""
      SELECT COALESCE(l_returnflag, '<all>') AS rf,
             COALESCE(l_linestatus, '<all>') AS ls,
             ${sqlSum("l_quantity")} AS sum_qty, COUNT(*) AS n,
             GROUPING(l_returnflag, l_linestatus) AS gid
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, rf, ls""")
  )

  /** Arbitrary GROUPING SETS — the general operator behind q18's ROLLUP
    * and q22's CUBE: the set list ((rf, ls), (ls), ()) is NOT a rollup
    * prefix chain (it drops rf while keeping ls), so neither shorthand
    * can express it. TWO-PHASE plan: every aggregate here is algebraic
    * (sums/counts re-aggregate), so the table is aggregated ONCE at the
    * finest grouping — the union of all set columns — and only the
    * |groups|-sized intermediate runs through the grouping-sets Expand.
    * Spark's native single-phase groupingSets expands |sets| copies of
    * every input row map-side (partial agg keeps the EXCHANGE at group
    * rows, but the scan-side CPU is |sets| × |input|); the two-phase
    * shape does 1× scan work at any scale and the Expand touches rows
    * the size of the answer. The exact-decimal detour spans both phases
    * (dsumPartial keeps the decimal accumulator; dsumMerge re-aggregates
    * associatively), so results stay bit-identical to the one-phase
    * plan. Same NULL-sentinel + grouping_id discipline as q18 (Spark
    * sorts NULLS FIRST, DuckDB NULLS LAST).
    */
  val q48GroupingSets: QueryDef = QueryDef(
    "q48_grouping_sets",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Exact.dsumPartial(col("l_quantity")).as("pq"),
          Exact.dsumPartial(col("l_extendedprice")).as("pp"),
          count(lit(1)).as("pc"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(Exact.dsumMerge(col("pq")).as("sum_qty"),
          Exact.dsumMerge(col("pp")).as("sum_price"),
          sum(col("pc")).as("n"),
          grouping_id().as("gid"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls2"),
          col("sum_qty"), col("sum_price"), col("n"), col("gid"))
        .orderBy("gid", "rf", "ls2"),
    Some(s"""
      SELECT COALESCE(l_returnflag, '<all>') AS rf,
             COALESCE(l_linestatus, '<all>') AS ls2,
             ${sqlSum("l_quantity")} AS sum_qty,
             ${sqlSum("l_extendedprice")} AS sum_price,
             COUNT(*) AS n,
             GROUPING(l_returnflag, l_linestatus) AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY gid, rf, ls2""")
  )

  /** CUBE aggregation — every grouping-set combination in ONE aggregate
    * (q18's ROLLUP covers the hierarchy; CUBE adds the cross slices).
    * Same single-shuffle expansion: Spark explodes the grouping sets
    * map-side, so the exchange carries each input row once per set with
    * partial aggregation already applied.
    */
  val q22Cube: QueryDef = QueryDef(
    "q22_cube",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          grouping_id().as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("st"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("pri"),
          col("n"), col("total"), col("gid"))
        .orderBy("gid", "st", "pri"),
    Some(s"""
      SELECT COALESCE(o_orderstatus, '<all>') AS st,
             COALESCE(o_orderpriority, '<all>') AS pri,
             COUNT(*) AS n,
             ${sqlSum("o_totalprice")} AS total,
             GROUPING(o_orderstatus, o_orderpriority) AS gid
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, st, pri""")
  )

  /** Correlated subqueries through the `spark.sql` ENTRY (every other
    * query uses the DataFrame API; this one exercises SQL parsing +
    * Catalyst's subquery decorrelation): EXISTS and NOT EXISTS rewrite
    * to semi/anti joins, the IN subquery to a semi join — the plan ends
    * up the same shuffle-discipline shape as q4/q5, arrived at from SQL.
    * Predicates are integer-exact so both engines agree bit-for-bit.
    */
  val q26Subqueries: QueryDef = QueryDef(
    "q26_subqueries",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % 7 = 0)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderkey % 11 = 0)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % 7 = 0)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderkey % 11 = 0)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
      ORDER BY c_custkey""")
  )

  /** Set operations: INTERSECT/EXCEPT with DISTINCT semantics on both
    * engines (nations having customers vs nations having suppliers).
    */
  val q19SetOps: QueryDef = QueryDef(
    "q19_setops",
    (s, dir) => {
      val custNations = Tables.load(s, dir, "customer").select("c_nationkey")
      val suppNations = Tables.load(s, dir, "supplier").select("s_nationkey")
        .withColumnRenamed("s_nationkey", "c_nationkey")
      val both = custNations.intersect(suppNations)
        .withColumn("kind", lit("both"))
      val custOnly = custNations.except(suppNations)
        .withColumn("kind", lit("cust_only"))
      both.unionByName(custOnly)
        .withColumnRenamed("c_nationkey", "nationkey")
        .orderBy("kind", "nationkey")
    },
    Some("""
      SELECT nationkey, kind FROM (
        SELECT c_nationkey AS nationkey, 'both' AS kind FROM
          (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT c_nationkey AS nationkey, 'cust_only' AS kind FROM
          (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier))
      ORDER BY kind, nationkey""")
  )

  /** Calendar decomposition (SURVEY §2 F date/time): year/month/day
    * extraction + per-month aggregation. day-of-week is deliberately
    * avoided (Spark and DuckDB number weekdays differently); year/month/day
    * have identical semantics.
    */
  val q20DateParts: QueryDef = QueryDef(
    "q20_date_parts",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          money(col("o_totalprice")).as("p"))
        .groupBy("y", "m")
        .agg(count(lit(1)).as("n"), max(col("d")).as("max_day"),
          Exact.dsumScaled(col("p"), 2).as("total"))
        .orderBy("y", "m"),
    Some(s"""
      SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
             EXTRACT(MONTH FROM o_orderdate) AS m,
             COUNT(*) AS n,
             MAX(EXTRACT(DAY FROM o_orderdate)) AS max_day,
             CAST(SUM(${sqlMoney("o_totalprice")}) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Per-group top-k via the bounded-heap aggregate
    * ([[graft.expressions.TopKAggExpr]]) instead of a window rank: the
    * exchange carries at most k pairs per group per map partition rather
    * than every row. The oracle is the window formulation with the
    * identical total order (price DESC, orderkey ASC), so a heap that
    * drops or reorders under ties hash-mismatches.
    */
  val q29GroupTopK: QueryDef = QueryDef(
    "q29_group_topk",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(graft.expressions.TopK.topK(col("o_totalprice"), col("o_orderkey"), 3)
          .as("top"))
        .select(col("o_custkey"), explode(col("top")).as("t"))
        .select(col("o_custkey"), col("t.id").as("o_orderkey"),
          col("t.value").as("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey"),
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, o_orderkey""")
  )

  /** Exact interpolated percentiles (PERCENTILE_CONT semantics) per
    * group, formulated MANUALLY on both engines — rank selection via
    * row_number + the standard `pos = p·(n−1)+1`, `v_lo + (v_hi−v_lo)·
    * frac` interpolation — rather than each engine's built-in
    * (`percentile` vs `quantile_cont`), whose internal accumulation
    * orders may differ in the last ulps. Every arithmetic step is the
    * same IEEE expression on both sides, so the hash compare tolerates
    * zero error. Quantile values come from
    * [[graft.core.Ranks.orderStatistics]] — per-(group, cell) counts,
    * driver-side target location, then ranking ONLY inside the ≤2 cells
    * per target — so the table is scanned but NEVER shuffled, and no
    * per-group rank window (whose plan sorts each group's whole slice on
    * one reducer: |g|=3 here ⇒ three reducers each sorting a third of
    * the table at 100 TB) appears anywhere. Exact global quantiles
    * fundamentally need rank selection; the approximate path
    * (percentile_approx/KLL) trades it for mergeable sketches but loses
    * external verifiability.
    */
  val q31Percentiles: QueryDef = QueryDef(
    "q31_percentiles",
    (s, dir) =>
      // l_extendedprice spans ~[900, 105k); 64 fixed cells keep the
      // densest cell ≪ group size (bounds are balance-only, see Ranks).
      // orderStatistics: counts pass + target-cell-only ranking — the
      // full table is scanned but NEVER shuffled (no per-row ranks).
      graft.core.Ranks.orderStatistics(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v")),
        "g", "v", buckets = 64, vLo = 0.0, vHi = 110000.0,
        ps = Seq(0.25, 0.5, 0.75, 0.9))
        .select(col("g").as("l_returnflag"), col("p"),
          col("q").as("quantile"))
        .orderBy("l_returnflag", "p"),
    Some("""
      WITH ranked AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      ps AS (SELECT UNNEST([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE, 0.9::DOUBLE]) AS p),
      grid AS (
        SELECT g, n, p, p * (n - 1) + 1 AS pos,
               CAST(FLOOR(p * (n - 1) + 1) AS BIGINT) AS lo,
               CAST(CEIL(p * (n - 1) + 1) AS BIGINT) AS hi
        FROM (SELECT DISTINCT g, n FROM ranked), ps)
      SELECT grid.g AS l_returnflag, grid.p,
             lo_r.v + (hi_r.v - lo_r.v) * (grid.pos - FLOOR(grid.pos)) AS quantile
      FROM grid
      JOIN ranked lo_r ON lo_r.g = grid.g AND lo_r.rn = grid.lo
      JOIN ranked hi_r ON hi_r.g = grid.g AND hi_r.rn = grid.hi
      ORDER BY l_returnflag, p""")
  )

  /** GLOBAL exact interpolated percentiles — the single-group case of
    * q31, and the one a window formulation handles WORST: ranking the
    * whole table in one ungrouped window is one reducer sorting the
    * corpus. [[graft.core.Ranks.valueBucketed]] makes the global case
    * exactly as parallel as the grouped one (cells carry all the
    * parallelism; the group column is a constant), which is the point of
    * owning rank assignment instead of composing a window: exact
    * p50/p99 over 100 TB without a single-machine sort anywhere. Same
    * manual interpolation discipline as q31 (identical IEEE steps both
    * engines, zero tolerance).
    */
  val q47GlobalPercentiles: QueryDef = QueryDef(
    "q47_global_percentiles",
    (s, dir) =>
      graft.core.Ranks.orderStatistics(
        Tables.load(s, dir, "lineitem")
          .select(lit("all").as("g"), col("l_extendedprice").as("v")),
        "g", "v", buckets = 128, vLo = 0.0, vHi = 110000.0,
        ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99))
        .select(col("p"), col("q").as("quantile"))
        .orderBy("p"),
    Some("""
      WITH ranked AS (
        SELECT l_extendedprice AS v,
               ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER () AS n
        FROM lineitem),
      ps AS (SELECT UNNEST([0.01::DOUBLE, 0.25::DOUBLE, 0.5::DOUBLE,
                            0.75::DOUBLE, 0.99::DOUBLE]) AS p),
      grid AS (
        SELECT n, p, p * (n - 1) + 1 AS pos,
               CAST(FLOOR(p * (n - 1) + 1) AS BIGINT) AS lo,
               CAST(CEIL(p * (n - 1) + 1) AS BIGINT) AS hi
        FROM (SELECT DISTINCT n FROM ranked), ps)
      SELECT grid.p,
             lo_r.v + (hi_r.v - lo_r.v) * (grid.pos - FLOOR(grid.pos)) AS quantile
      FROM grid
      JOIN ranked lo_r ON lo_r.rn = grid.lo
      JOIN ranked hi_r ON hi_r.rn = grid.hi
      ORDER BY p""")
  )

  /** UNPIVOT / melt — the reshape inverse of the f1/q8 pivots: four
    * measure columns become (measure, value) rows via Spark's native
    * `unpivot` (an Expand node — per-row fan-out, no shuffle, no UDF).
    * The oracle is the engine-agnostic UNION ALL formulation; values
    * pass through unchanged so the compare is exact.
    */
  val q38Unpivot: QueryDef = QueryDef(
    "q38_unpivot",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
    Some("""
      SELECT * FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity AS value FROM lineitem WHERE l_orderkey <= 2000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey <= 2000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey <= 2000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey <= 2000)
      ORDER BY l_orderkey, l_linenumber, measure""")
  )

  /** Winsorized robust statistics — clamp each group's values to its own
    * [p05, p95] band before averaging, the outlier-resistant mean every
    * metrics pipeline reports next to the raw one. The band uses q31's
    * manual rank-interpolation (identical IEEE steps on both engines),
    * the clamp is two comparisons, and the clamped mean takes the exact
    * decimal detour so accumulation order cannot perturb it. Ranks ride
    * [[graft.core.Ranks.valueBucketed]] (two parallel passes, no
    * per-group single-reducer sort — see q31); one aggregate after; the
    * band rows broadcast back.
    */
  val q41Winsorized: QueryDef = QueryDef(
    "q41_winsorized",
    (s, dir) => {
      val vals = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      // p05/p95 via orderStatistics (counts + target-cell ranking, no
      // full-table shuffle), pivoted into one band row per group
      val band = graft.core.Ranks.orderStatistics(vals, "g", "v",
          buckets = 64, vLo = 0.0, vHi = 110000.0, ps = Seq(0.05, 0.95))
        .groupBy("g")
        .agg(max(when(col("p") === 0.05, col("q"))).as("p05"),
          max(when(col("p") === 0.95, col("q"))).as("p95"))
      vals.join(broadcast(band), Seq("g"))
        .withColumn("cv", least(greatest(col("v"), col("p05")), col("p95")))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          dsum(col("cv")).as("win_sum"),
          sum(when(col("v") < col("p05") || col("v") > col("p95"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .select(col("g").as("l_returnflag"), col("n"),
          (col("win_sum") / col("n")).as("winsorized_mean"), col("n_clipped"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH ranked AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      grid AS (
        SELECT g, n, p, p * (n - 1) + 1 AS pos,
               CAST(FLOOR(p * (n - 1) + 1) AS BIGINT) AS lo,
               CAST(CEIL(p * (n - 1) + 1) AS BIGINT) AS hi
        FROM (SELECT DISTINCT g, n FROM ranked),
             (SELECT UNNEST([0.05::DOUBLE, 0.95::DOUBLE]) AS p)),
      pcts AS (
        SELECT grid.g, grid.p,
               lo_r.v + (hi_r.v - lo_r.v) * (grid.pos - FLOOR(grid.pos)) AS q
        FROM grid
        JOIN ranked lo_r ON lo_r.g = grid.g AND lo_r.rn = grid.lo
        JOIN ranked hi_r ON hi_r.g = grid.g AND hi_r.rn = grid.hi),
      band AS (
        SELECT g, MAX(CASE WHEN p = 0.05 THEN q END) AS p05,
                  MAX(CASE WHEN p = 0.95 THEN q END) AS p95
        FROM pcts GROUP BY g)
      SELECT r.g AS l_returnflag, COUNT(*) AS n,
             ${Exact.sqlSum("LEAST(GREATEST(r.v, b.p05), b.p95)")} / COUNT(*) AS winsorized_mean,
             CAST(SUM(CASE WHEN r.v < b.p05 OR r.v > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
      FROM ranked r JOIN band b USING (g)
      GROUP BY r.g ORDER BY l_returnflag""")
  )

  /** Data-quality gate ([[graft.core.Checks]]) over lineitem: null /
    * range / pattern checks fold into one shared aggregate pass, key
    * uniqueness is one distinct count, referential integrity one
    * anti-join against the orders keys. The quantity range is
    * deliberately tighter than the data (1..25 vs the populated 1..50)
    * so the violations column is non-vacuous; the oracle recomputes
    * every count relationally.
    */
  val q42QualityChecks: QueryDef = QueryDef(
    "q42_quality_checks",
    (s, dir) => {
      import graft.core.Checks._
      val li = Tables.load(s, dir, "lineitem")
      report(li, Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", 1, 25),
        InRange("l_discount", 0.0, 0.1),
        Matches("l_returnflag", "^[ANR]$"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_orderkey", Tables.load(s, dir, "orders"), "o_orderkey")))
    },
    Some("""
      SELECT * FROM (
        SELECT 'not_null:l_orderkey' AS check_name,
               CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations,
               COUNT(*) AS n_rows FROM lineitem
        UNION ALL
        SELECT 'in_range:l_quantity[1.0,25.0]',
               CAST(COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
                 AND (l_quantity < 1 OR l_quantity > 25)) AS BIGINT),
               COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'in_range:l_discount[0.0,0.1]',
               CAST(COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                 AND (l_discount < 0.0 OR l_discount > 0.1)) AS BIGINT),
               COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'matches:l_returnflag:^[ANR]$',
               CAST(COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
                 AND NOT regexp_matches(l_returnflag, '^[ANR]$')) AS BIGINT),
               COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'unique:l_orderkey,l_linenumber',
               CAST(COUNT(*) - (SELECT COUNT(*) FROM
                 (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT),
               COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'ref:l_orderkey',
               CAST(COUNT(*) FILTER (WHERE NOT EXISTS
                 (SELECT 1 FROM orders o WHERE o.o_orderkey = lineitem.l_orderkey)) AS BIGINT),
               COUNT(*) FROM lineitem)
      ORDER BY check_name""")
  )

  /** Distribution-drift monitoring — the model/data-health check every
    * production pipeline runs between snapshots: histogram the same
    * metric over two samples (here the event-id parity split stands in
    * for "last week vs this week"), report per-bucket probability deltas
    * and the total-variation distance ½·Σ|p−q|. TVD instead of PSI/KL
    * keeps the statistic `ln`-free: per-bucket deltas are single IEEE
    * expressions over exact integer counts, and the cross-bucket sum
    * takes a scale-12 decimal detour — order-free, and small enough that
    * the decimal→double conversion is a single correctly-rounded divide
    * on both engines (scale 18 pushes the scaled integer past 2^53 and
    * double-rounds differently per engine). Two
    * shared-scan aggregates, 20-bucket output — constant-size result at
    * any corpus scale.
    */
  val q46Drift: QueryDef = QueryDef(
    "q46_drift",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("sample", pmod(col("event_id"), lit(2)))
        .withColumn("bucket",
          least(floor(col("value") / lit(5.0)), lit(19.0)).cast("long"))
      val counts = ev.groupBy("bucket").agg(
        sum(when(col("sample") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("sample") === 1, 1L).otherwise(0L)).as("n_b"))
      val totals = counts.agg(sum(col("n_a")).as("tot_a"),
        sum(col("n_b")).as("tot_b"))
      val probs = counts.crossJoin(broadcast(totals))
        .withColumn("p_a", col("n_a").cast(DoubleType) / col("tot_a").cast(DoubleType))
        .withColumn("p_b", col("n_b").cast(DoubleType) / col("tot_b").cast(DoubleType))
        .withColumn("abs_delta", abs(col("p_a") - col("p_b")))
      // scalar TVD via a broadcast 1-row aggregate, never the
      // empty-partition window (the single-task anti-pattern)
      val tvd = probs.agg(
        (sum(col("abs_delta").cast(DecimalType(38, 12))).cast(DoubleType) / 2.0)
          .as("tvd"))
      probs.crossJoin(broadcast(tvd))
        .select("bucket", "n_a", "n_b", "p_a", "p_b", "abs_delta", "tvd")
        .orderBy("bucket")
    },
    Some("""
      WITH e AS (
        SELECT event_id % 2 AS sample,
               CAST(LEAST(FLOOR(value / 5.0), 19.0) AS BIGINT) AS bucket
        FROM events),
      c AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN sample = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN sample = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM e GROUP BY bucket),
      t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
                   CAST(SUM(n_b) AS BIGINT) AS tot_b FROM c),
      p AS (
        SELECT bucket, n_a, n_b,
               CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE) AS p_a,
               CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE) AS p_b,
               ABS(CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE)
                   - CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE)) AS abs_delta
        FROM c, t)
      SELECT bucket, n_a, n_b, p_a, p_b, abs_delta,
             CAST((SELECT SUM(CAST(abs_delta AS DECIMAL(38,12))) FROM p) AS DOUBLE)
               / 2.0 AS tvd
      FROM p ORDER BY bucket""")
  )

  /** Per-group MODE (most frequent value) with a SPECIFIED tie-break —
    * SQL's MODE() leaves ties implementation-defined, so the operator is
    * spelled out as the deterministic double aggregate: count per
    * (group, value), then argmax by (count, −value) via max(struct(…)) —
    * two map-side-combinable aggregations, no window sort, ties resolve
    * to the SMALLEST value on both engines by construction.
    */
  val q56Mode: QueryDef = QueryDef(
    "q56_mode",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("cnt"), (-col("qty")).as("negq"))).as("best"),
          count(lit(1)).as("n_distinct_qty"))
        .select(col("l_returnflag"), (-col("best.negq")).as("mode_qty"),
          col("best.cnt").as("mode_count"), col("n_distinct_qty"))
        .orderBy("l_returnflag"),
    Some("""
      WITH c AS (
        SELECT l_returnflag, l_quantity AS qty, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_quantity)
      SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count,
             n_distinct_qty
      FROM (
        SELECT l_returnflag, qty, cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                 ORDER BY cnt DESC, qty) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n_distinct_qty
        FROM c)
      WHERE rn = 1 ORDER BY l_returnflag""")
  )

  /** EQUAL-FREQUENCY discretization (decile binning) — the feature-
    * engineering step that turns a skewed numeric column into a uniform
    * categorical one (quantile sketch binning in feature stores; also
    * the histogram-equalization analog of q10's equal-WIDTH bins).
    * Boundaries are the nine exact interior deciles via
    * [[graft.core.Ranks.orderStatistics]] (no full-table shuffle, see
    * q31), collected into one sorted array and broadcast; every row's
    * bin is then `#{boundaries ≤ v}` — a codegen'd array `filter` over
    * nine doubles, no join fan-out. One aggregate over 10 keys closes
    * it out. Bin-boundary ties bin identically on both engines (the
    * count-of-≤ formulation is order-free), so the oracle is exact.
    */
  val q58EqualFreqBins: QueryDef = QueryDef(
    "q58_equal_freq_bins",
    (s, dir) => {
      val vals = Tables.load(s, dir, "lineitem")
        .select(lit("all").as("g"), col("l_extendedprice").as("v"))
      val bounds = graft.core.Ranks.orderStatistics(vals, "g", "v",
          buckets = 128, vLo = 0.0, vHi = 110000.0,
          ps = (1 to 9).map(_ / 10.0))
        .agg(array_sort(collect_list(col("q"))).as("bs"))
      vals.crossJoin(broadcast(bounds))
        .withColumn("bin",
          size(filter(col("bs"), x => col("v") >= x)).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
          max(col("v")).as("mx"))
        .orderBy("bin")
    },
    Some("""
      WITH ranked AS (
        SELECT l_extendedprice AS v,
               ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER () AS n
        FROM lineitem),
      ps AS (SELECT UNNEST([0.1::DOUBLE, 0.2::DOUBLE, 0.3::DOUBLE,
                            0.4::DOUBLE, 0.5::DOUBLE, 0.6::DOUBLE,
                            0.7::DOUBLE, 0.8::DOUBLE, 0.9::DOUBLE]) AS p),
      grid AS (
        SELECT p, p * (n - 1) + 1 AS pos,
               CAST(FLOOR(p * (n - 1) + 1) AS BIGINT) AS lo,
               CAST(CEIL(p * (n - 1) + 1) AS BIGINT) AS hi
        FROM (SELECT DISTINCT n FROM ranked), ps),
      qs AS (
        SELECT lo_r.v + (hi_r.v - lo_r.v) * (grid.pos - FLOOR(grid.pos)) AS q
        FROM grid
        JOIN ranked lo_r ON lo_r.rn = grid.lo
        JOIN ranked hi_r ON hi_r.rn = grid.hi),
      bs AS (SELECT list_sort(list(q)) AS bs FROM qs)
      SELECT CAST(len(list_filter(bs, x -> l_extendedprice >= x)) AS BIGINT) AS bin,
             COUNT(*) AS n, MIN(l_extendedprice) AS mn,
             MAX(l_extendedprice) AS mx
      FROM lineitem, bs
      GROUP BY 1 ORDER BY bin""")
  )

  val all: Seq[QueryDef] =
    Seq(q1Agg, q2TopK, q10Histogram, q11SummaryStats, q12Distinct, q13StringFuncs,
      q18Rollup, q19SetOps, q20DateParts, q22Cube, q26Subqueries, q29GroupTopK,
      q31Percentiles, q38Unpivot, q41Winsorized, q42QualityChecks, q46Drift,
      q47GlobalPercentiles, q48GroupingSets, q56Mode, q58EqualFreqBins)
}
