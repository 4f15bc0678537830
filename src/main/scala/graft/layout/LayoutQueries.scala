package graft.layout

import graft.QueryDef
import graft.core.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Data-LAYOUT operators — the table-format side of running this engine
  * against 100 TB: bucketed co-located joins, small-file compaction
  * planning, file-level data-skipping statistics, and Z-order
  * multi-dimensional clustering. The reference has no layout layer (its
  * per-file pandas analytics never reach the point where physical layout
  * matters, /root/reference/picoprobe/flow_analyzer.py); at target scale
  * layout IS the difference between a query that reads 100 TB and one
  * that reads 100 GB, so these are first-class, oracle-checked operators
  * here.
  */
object LayoutQueries {

  // ---------------------------------------------------------------- b1
  /** One-time-per-JVM bucketed copies of lineitem/orders, co-bucketed on
    * the join key. Files land in a temp dir (external-table `path`), table
    * metadata in the session's in-memory catalog; keyed by sf dir so
    * verify (sf0.01) and bench (sf0.1) runs in one JVM don't collide.
    */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private val tableSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def ensureBucketed(s: SparkSession, dir: String): (String, String) =
    bucketedTables.computeIfAbsent(
      Tables.corpusCacheKey(s, dir, "lineitem") + "+" +
        Tables.corpusCacheKey(s, dir, "orders"), _ => {
      // collision-free tag: a per-insert counter (two distinct dirs can
      // never share a table name, unlike the 32-bit dir.hashCode)
      val tag = tableSeq.getAndIncrement().toString
      val (lt, ot) = (s"b1_lineitem_$tag", s"b1_orders_$tag")
      val base = java.nio.file.Files.createTempDirectory("graft-b1").toString
      // repartition on the bucket key first: each writer task then owns
      // exactly one bucket, so every bucket is ONE sorted file and the
      // read side can consume the sortBy order without a SortExec.
      Tables.load(s, dir, "lineitem")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(lt)
      Tables.load(s, dir, "orders")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(ot)
      (lt, ot)
    })

  /** The raw co-bucketed join (pre-rollup), public so the plan spec can
    * pin its exchange-free shape. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = ensureBucketed(s, dir)
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
  }

  /** Exchange-free fact⋈fact join via co-bucketed tables: both sides are
    * written `bucketBy(8, orderkey) sortBy(orderkey)`, so the sort-merge
    * join consumes the tables' OWN layout — no shuffle and no sort on
    * either leg (LayoutQueriesSpec pins zero ShuffleExchange/Sort below
    * the join). This is THE pattern for a 100 TB fact-to-fact join that
    * runs every day: pay the shuffle once at write time, then every
    * subsequent join is embarrassingly parallel per bucket. The only
    * exchange left in the plan is the final tiny per-priority rollup.
    * Oracle: the layout must not change the answer — plain join SQL.
    */
  val b1BucketedJoin: QueryDef = QueryDef(
    "b1_bucketed_join",
    (s, dir) =>
      bucketedJoin(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          Exact.dsumUnits(Exact.moneyUnits(col("l_extendedprice")) *
            Exact.moneyUnits(lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy("o_orderpriority"),
    Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_lines,
             CAST(SUM(${Exact.sqlMoney("l_extendedprice")} *
                      ${Exact.sqlMoney("1.0 - l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  // ---------------------------------------------------------------- b2
  private val partitionedTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One-time-per-JVM month-partitioned copy of lineitem (hive-style
    * `ship_month=yyyy-MM/` directories — the layout a 100 TB fact table
    * actually has). */
  private def ensurePartitioned(s: SparkSession, dir: String): String =
    partitionedTables.computeIfAbsent(
      Tables.corpusCacheKey(s, dir, "lineitem"), _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-b2").toString
      Tables.load(s, dir, "lineitem")
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("ship_month")
        .parquet(s"$base/lineitem")
      s"$base/lineitem"
    })

  /** DYNAMIC PARTITION PRUNING: the fact table is laid out in hive-style
    * month partitions, the dimension side (months of a 60-day order
    * window) is only known at RUNTIME — and Catalyst still prunes the
    * fact scan down to the few matching month directories by injecting
    * the broadcast dim keys as a partition filter (the
    * `dynamicpruningexpression` the spec pins, with the actually-read
    * partition count asserted « the total). This is the engine-native
    * complement to c7: c7 plans skipping from persisted stats, DPP
    * prunes at execution time from join keys no planner could know
    * statically. At 100 TB this is the difference between scanning 84
    * months and scanning 3.
    */
  val b2PartitionPruning: QueryDef = QueryDef(
    "b2_partition_pruning",
    (s, dir) => {
      val fact = s.read.parquet(ensurePartitioned(s, dir))
      val dim = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-05-01").cast("timestamp"))
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
        .distinct()
      fact.join(dim, Seq("ship_month"))
        .groupBy("ship_month")
        .agg(count(lit(1)).as("n_lines"),
          Exact.dsumUnits(Exact.moneyUnits(col("l_extendedprice")) *
            Exact.moneyUnits(lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy("ship_month")
    },
    Some(s"""
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             COUNT(*) AS n_lines,
             CAST(SUM(${Exact.sqlMoney("l_extendedprice")} *
                      ${Exact.sqlMoney("1.0 - l_discount")}) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE strftime(l_shipdate, '%Y-%m') IN (
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-05-01 00:00:00')
      GROUP BY 1 ORDER BY ship_month""")
  )

  // ---------------------------------------------------------------- b3
  private val timePartTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One-time-per-JVM DAY-partitioned copy of events (hive-style
    * `event_day=yyyy-MM-dd/` directories — how a 100 TB event store is
    * actually laid out). The partition column derives from the
    * normalized ns-epoch ts (`utc_day = ts div ns_per_day` — events ts
    * is non-negative, so truncating div IS the floor); the derivation
    * contract is PERSISTED next to the table as the
    * [[graft.plans.DerivedPartitions]] `_graft_meta.json` sidecar —
    * write-path metadata, so any session (not just the writing JVM)
    * may translate ts bounds into directory bounds. Deliberately NOT
    * also registered in-memory: every b3 run exercises the cold-registry
    * path a fresh cluster session would take.
    */
  private[layout] def ensureTimePartitioned(s: SparkSession, dir: String): String =
    timePartTables.computeIfAbsent(
      Tables.corpusCacheKey(s, dir, "events"), _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-b3").toString
      val path = s"$base/events"
      Tables.load(s, dir, "events")
        .withColumn("event_day",
          date_add(to_date(lit("1970-01-01")),
            expr("cast(ts div 86400000000000 as int)")))
        .write.mode("overwrite").partitionBy("event_day").parquet(path)
      graft.plans.DerivedPartitions.persist(path,
        s.sessionState.newHadoopConf())
      path
    })

  /** STATIC partition-directory pruning from an epoch-range predicate:
    * the user filters on raw `ts` (the only column a time-series API
    * exposes), the store is day-partitioned, and the
    * [[graft.plans.DerivedPartitionPushdown]] rule injects the implied
    * `event_day` bounds — so the scan's `PartitionFilters` prune to the
    * 3 matching day directories out of 30 (spec-pinned, with the
    * partitions-read count asserted) before a single footer is opened.
    * This is the complement of q62's TsRangePushdown (row-group pruning
    * WITHIN files) and b2's DPP (runtime key-driven pruning): together
    * they cover the three tiers a 100 TB time-organized table prunes
    * at — directory, footer, runtime. The bounds here are deliberately
    * NOT day-aligned: flooring must stay conservative. Oracle: pruning
    * must not change the answer — plain range SQL over the original
    * table.
    */
  val b3TimePartitionPruning: QueryDef = QueryDef(
    "b3_time_partition_pruning",
    (s, dir) => {
      val lo = 1_704_866_400_000_000_000L // 2024-01-10T06:00:00Z (ns)
      val hi = 1_705_082_400_000_000_000L // 2024-01-12T18:00:00Z (ns)
      s.read.parquet(ensureTimePartitioned(s, dir))
        .filter(col("ts") >= lo && col("ts") < hi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          Exact.dsumScaled(Exact.money(col("value")), 2).as("total_value"))
        .orderBy("event_type")
    },
    Some(s"""
      SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
             CAST(SUM(${Exact.sqlMoney("value")}) AS DOUBLE) AS total_value
      FROM events
      WHERE epoch_ns(ts) >= 1704866400000000000 AND epoch_ns(ts) < 1705082400000000000
      GROUP BY 1 ORDER BY event_type""")
  )

  // ---------------------------------------------------------------- c6
  /** Small-file COMPACTION planner: given a manifest of (file, size),
    * assign files to target-size rewrite bins — sequential first-fit in
    * (source, doc_id) order, bin boundary = running size crossing the
    * target. The running sum is a per-source ordered window, which is
    * exactly right here because the input is a MANIFEST (O(files) rows,
    * ~1e6 at 100 TB — metadata scale), not table data; a manifest source
    * partition is thousands of entries, so the per-source sort is
    * bounded and the plan stays fully parallel across sources.
    * Deterministic integer arithmetic end to end.
    */
  val c6CompactionPlan: QueryDef = QueryDef(
    "c6_compaction_plan",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 8192L
      val manifest = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          length(col("text")).cast("long").as("size"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      manifest
        .withColumn("cum", sum(col("size")).over(w))
        .select(col("doc_id"), col("source"), col("size"),
          ((col("cum") - col("size")) / target).cast("long").as("bin"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("bin_bytes"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS size,
               SUM(CAST(LENGTH(text) AS BIGINT)) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents)
      SELECT source, CAST((cum - size) // 8192 AS BIGINT) AS bin,
             COUNT(*) AS n_files,
             CAST(SUM(size) AS BIGINT) AS bin_bytes,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM m GROUP BY source, bin ORDER BY source, bin""")
  )

  // ---------------------------------------------------------------- c7
  /** File-level DATA-SKIPPING statistics + pruning decision: per "file"
    * (orderkey-range slices standing in for parquet row groups) min/max
    * of the predicate column, then whether a `o_totalprice >= 400000`
    * scan could skip the file entirely (mx below the cut). This is the
    * manifest-side half of predicate pushdown — the stats table is what
    * a format like Delta/Iceberg persists, and the `would_scan` bit is
    * the planner's file-pruning decision, made from O(files) metadata
    * without touching data. min/max are selection (not accumulation)
    * aggregates, so doubles are bit-exact cross-engine.
    */
  val c7DataSkipping: QueryDef = QueryDef(
    "c7_data_skipping",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy((col("o_orderkey") / 4096L).cast("long").as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        .withColumn("would_scan", col("mx") >= 400000.0)
        .orderBy("file_id"),
    Some("""
      SELECT CAST(o_orderkey // 4096 AS BIGINT) AS file_id,
             COUNT(*) AS n_rows, MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx,
             MAX(o_totalprice) >= 400000.0 AS would_scan
      FROM orders GROUP BY 1 ORDER BY file_id""")
  )

  // ---------------------------------------------------------------- z1
  /** 10-bit column pair for the Z-order demo: part and supplier keys of
    * each lineitem, both folded into [0, 1024). */
  private def zBits = 10

  /** Bit-interleaved Z-value of two 10-bit ints as a pure column
    * expression (x bits at odd positions, y at even) — codegen-friendly
    * shifts/masks, no UDF. */
  private def zValue(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until zBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i)).cast("long")
    }.reduce(_ + _)

  /** The same interleave spelled in DuckDB SQL. */
  private def zValueSql(x: String, y: String): String =
    (0 until zBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) + ((($y >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** Z-ORDER clustering: interleave the bits of (l_partkey, l_suppkey)
    * into a Z-value, slice the Z-curve into clusters, and report each
    * cluster's bounding box in the original key space. The point of the
    * curve: each cluster is TIGHT in both dimensions at once (the pinned
    * spec asserts box side ≤ 1/8 of the key range for every cluster), so
    * files written in cluster order can skip on min/max stats for
    * predicates on EITHER key — the layout that makes c7-style skipping
    * work for two-column workloads. Pure integer shift/mask arithmetic,
    * bit-identical cross-engine; clustering is a groupBy (one shuffle of
    * pre-aggregated cluster rows), no global sort needed to ANALYZE the
    * layout (writing it would be one range-partitioned write).
    */
  val z1Zorder: QueryDef = QueryDef(
    "z1_zorder",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select((col("l_partkey") % 1024).cast("int").as("x"),
          (col("l_suppkey") % 1024).cast("int").as("y"))
      li.withColumn("cluster",
          shiftright(zValue(col("x"), col("y")), 14).cast("long"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH pts AS (
        SELECT CAST(l_partkey % 1024 AS INTEGER) AS x,
               CAST(l_suppkey % 1024 AS INTEGER) AS y
        FROM lineitem),
      z AS (
        SELECT x, y,
               (${zValueSql("x", "y")}) >> 14 AS cluster
        FROM pts)
      SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n_rows,
             MIN(x) AS x_min, MAX(x) AS x_max,
             MIN(y) AS y_min, MAX(y) AS y_max
      FROM z GROUP BY cluster ORDER BY cluster""")
  )

  val all: Seq[QueryDef] =
    Seq(b1BucketedJoin, b2PartitionPruning, b3TimePartitionPruning,
      c6CompactionPlan, c7DataSkipping, z1Zorder)
}
