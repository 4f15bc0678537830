package graft.queries

import graft.QueryDef
import graft.core.{Exact, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Join surface (SURVEY §2 D): inner/semi/anti equi-joins, broadcast dims.
  *
  * The reference's joins are implicit (FK filters and key-set membership,
  * /root/reference/picoprobe/flow_analyzer.py:306-317,
  * examples/xloop2023/performance.ipynb cell 8); the harness requires the
  * full relational set. Scale notes: fact-fact joins shuffle on the join
  * key (AQE picks sort-merge vs shuffled-hash and handles skew); dimension
  * joins are broadcast explicitly so no shuffle of the fact side occurs.
  */
object JoinQueries {

  import Exact.{money, sqlMoney}

  // revenue in scale-4 LONG units (r15 optimization, Exact.dsumUnits doc):
  // same cent-unit integers as money(price)·money(1−disc), one long
  // multiply per row instead of a wide Decimal multiply
  private def revenue4 = Exact.moneyUnits(col("l_extendedprice")) *
    Exact.moneyUnits(lit(1.0) - col("l_discount"))
  private def sqlRevenue = s"${sqlMoney("l_extendedprice")} * ${sqlMoney("1.0 - l_discount")}"

  /** TPC-H Q3 shape: two fact joins + grouped revenue. customer is the
    * small side per-key after its segment filter — at 100 TB AQE decides
    * broadcast vs shuffle; the groupBy reuses the join's hash partitioning
    * on l_orderkey where possible.
    */
  val q3JoinAgg: QueryDef = QueryDef(
    "q3_join_agg",
    (s, dir) => {
      val cutoff = lit("1998-06-01 00:00:00").cast("timestamp")
      val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables.load(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val li   = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") >= cutoff)
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Exact.dsumUnits(revenue4, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        AND l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")
  )

  /** EXISTS as left-semi join (SURVEY §2 D3 key-set membership). */
  val q4SemiJoin: QueryDef = QueryDef(
    "q4_semijoin",
    (s, dir) => {
      val big = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 45)
      Tables.load(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      ORDER BY o_orderkey""")
  )

  /** NOT EXISTS as left-anti join: customers with no finalized ('F')
    * order. The filter lands on the build side before the join.
    */
  val q5AntiJoin: QueryDef = QueryDef(
    "q5_antijoin",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(
          Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""")
  )

  /** TPC-H Q5 shape: star join with explicitly broadcast dimensions
    * (nation/region are tiny at any scale — never shuffle the fact side
    * for them). Revenue per nation for one region.
    *
    * Join order (r15 optimization, guide §3): the region predicate is
    * applied FIRST — nation⋈region(ASIA) is a ~5-row driver-side-size
    * table, and both the customer and supplier legs inner-join it
    * (nationkey is unique, so this is a pure filter + n_name attach)
    * BEFORE any fact join. The final join condition requires
    * c_nationkey = s_nationkey ∈ ASIA, so pruning both legs early is
    * result-identical while cutting every downstream join input ~5×:
    * orders drop with their non-ASIA customers before lineitem is
    * touched. The previous shape joined the full customer×orders×
    * lineitem×supplier star and filtered by region LAST — at 100 TB
    * that shuffles 5× the bytes for the same answer.
    */
  val q6RegionJoin: QueryDef = QueryDef(
    "q6_region_join",
    (s, dir) => {
      val natAsia = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val custAsia = Tables.load(s, dir, "customer")
        .join(broadcast(natAsia.select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
      val supAsia = Tables.load(s, dir, "supplier")
        .join(broadcast(natAsia),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li  = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      custAsia.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supAsia, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(Exact.dsumUnits(revenue4, 4).as("revenue"))
        .orderBy("n_name")
    },
    Some(s"""
      SELECT n_name, CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name""")
  )

  /** Skew-salted fact join under the exact oracle: orders ⋈ customer on
    * custkey through [[graft.core.Skew.saltedJoin]] — each key spreads
    * over 8 reducers (deterministic salt from o_orderkey; customer side
    * replicated ×8), the explicit mitigation for hot keys known AHEAD of
    * runtime (AQE's skew join handles the discovered-at-runtime case).
    * Salting must be result-invisible, so the oracle is the PLAIN join:
    * any row lost or duplicated by the salt plumbing hash-mismatches.
    */
  val q23SkewJoin: QueryDef = QueryDef(
    "q23_skew_join",
    (s, dir) =>
      graft.core.Skew.saltedJoin(
        Tables.load(s, dir, "orders")
          .withColumnRenamed("o_custkey", "c_custkey"),
        Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
        key = "c_custkey",
        discriminator = col("o_orderkey"), salts = 8)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          Exact.dsumScaled(money(col("o_totalprice")), 2).as("total"))
        .orderBy("c_nationkey"),
    Some(s"""
      SELECT c_nationkey, COUNT(*) AS n_orders,
             CAST(SUM(${sqlMoney("o_totalprice")}) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** Pure range-predicate (interval) join through
    * [[graft.core.RangeJoin.intervalJoin]]: irregular per-order promotion
    * windows `[o_orderdate, o_orderdate + 1..14 days)` matched against ALL
    * lineitem shipdates — no equi-key, the case Spark would otherwise plan
    * as a nested-loop/cartesian. The bucketed plan explodes each window
    * onto its ≤14 day-buckets and equi-joins on the bucket id; the oracle
    * is the plain inequality join (DuckDB plans it as an IEJoin), so any
    * pair the bucketing drops or double-counts hash-mismatches.
    */
  val q27RangeJoin: QueryDef = QueryDef(
    "q27_range_join",
    (s, dir) => {
      val day = 86400000L
      // the dates are TIMESTAMP_NTZ; the session tz is pinned UTC
      // (GraftSession), so the cast to TIMESTAMP is an exact relabeling
      def ms(c: org.apache.spark.sql.Column) = unix_millis(c.cast("timestamp"))
      val iv = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          ms(col("o_orderdate")).as("ws"),
          (ms(col("o_orderdate")) +
            (lit(1) + col("o_orderkey") % 14) * day).as("we"))
      val pt = Tables.load(s, dir, "lineitem")
        .select(ms(col("l_shipdate")).as("p"), col("l_quantity"))
      graft.core.RangeJoin.intervalJoin(iv, "ws", "we", pt, "p", day)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderkey")
    },
    Some(s"""
      SELECT o_orderkey, COUNT(*) AS n_items,
             ${Exact.sqlSum("l_quantity")} AS sum_qty
      FROM (SELECT o_orderkey, o_orderdate AS ws,
                   o_orderdate + INTERVAL (1 + o_orderkey % 14) DAY AS we
            FROM orders WHERE o_orderkey % 97 = 0) iv
      JOIN lineitem ON l_shipdate >= ws AND l_shipdate < we
      GROUP BY o_orderkey ORDER BY o_orderkey""")
  )

  /** Bloom-prefiltered semi-join through [[graft.core.BloomJoin.semiJoin]]:
    * lineitem pruned by a 1 MiB bitset over the selected part keys BEFORE
    * any shuffle, then the exact semi-join. The bloom has no false
    * negatives, so the result is IDENTICAL to the plain semi-join — which
    * is the oracle: any row the bloom wrongly dropped (or the plumbing
    * duplicated) hash-mismatches.
    */
  val q28BloomSemijoin: QueryDef = QueryDef(
    "q28_bloom_semijoin",
    (s, dir) =>
      graft.core.BloomJoin.semiJoin(
        Tables.load(s, dir, "lineitem"), "l_partkey",
        Tables.load(s, dir, "part").filter(col("p_size") >= 48), "p_partkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag"),
    Some(s"""
      SELECT l_returnflag, COUNT(*) AS n_items,
             ${Exact.sqlSum("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM part
                    WHERE p_partkey = l_partkey AND p_size >= 48)
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** TPC-H Q3 shape — shipping-priority revenue: the canonical selective
    * three-way star (customer ⋈ orders ⋈ lineitem) with filters on every
    * leg and a top-10 on the aggregated join output. The segment-filtered
    * customer keys broadcast (no fact shuffle for that leg), orders ⋈
    * lineitem shuffles once on orderkey, revenue takes the exact decimal
    * product-sum so the top-10 cut is deterministic, and the final cut is
    * TakeOrdered (k rows cross, never a global sort).
    */
  val q43ShippingPriority: QueryDef = QueryDef(
    "q43_shipping_priority",
    (s, dir) => {
      val cutoff = lit("1997-01-01 00:00:00").cast("timestamp")
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(Exact.dsumUnits(revenue4, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT o_orderkey, o_orderdate, o_orderpriority,
             CAST(SUM(${sqlMoney("l_extendedprice")} * ${sqlMoney("1.0 - l_discount")}) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey LIMIT 10""")
  )

  /** TPC-H Q13 shape — customer order-count DISTRIBUTION: a LEFT OUTER
    * join (customers with zero matching orders must survive with count
    * 0 — the inner-join formulation silently drops them), then an
    * aggregate OF an aggregate: per-customer counts become the grouping
    * key of the second rollup. `count(o_orderkey)` counts non-null
    * matches only, which is exactly how the outer join encodes "no
    * orders".
    *
    * At 100 TB: one shuffle on custkey for the join + first aggregate
    * (co-partitioned, so AQE coalesces them), then the second aggregate
    * is |distinct counts| rows — trivial. Order-count skew (one mega
    * customer) is the classic AQE skew-join case; keys here are uniform.
    */
  val q51CustDistribution: QueryDef = QueryDef(
    "q51_cust_distribution",
    (s, dir) => {
      val counts = Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") =!= "F"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  )

  /** TPC-H Q11 shape — FRACTION-OF-TOTAL filtering: keep the parts whose
    * aggregate value exceeds 1.3× the mean part value (mean-relative, so
    * the threshold discriminates at every scale factor; Q11's fixed
    * fraction degenerates when |parts| crosses 1/fraction). The scalar
    * threshold is a second aggregation OVER the first one's output (not a
    * rescan) broadcast back as a 1-row cross join — the "HAVING against a
    * scalar subquery" operator. Value sums take the money-decimal detour
    * on both engines, are cast to DOUBLE once, and the threshold is the
    * same two IEEE ops — so the > comparison is bit-identical even at
    * the boundary.
    *
    * At 100 TB: one shuffle for the per-part aggregate (map-side
    * combined), a 1-row reduce for the total, and the filter streams over
    * the already-aggregated per-part rows. Nothing rescans the fact.
    */
  val q54ValueConcentration: QueryDef = QueryDef(
    "q54_value_concentration",
    (s, dir) => {
      val perPart = Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(Exact.dsumPartial(col("l_extendedprice")).as("val_dec"))
      val total = perPart.agg(sum(col("val_dec")).as("tot_dec"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .filter(col("val_dec").cast(DoubleType) >
          col("tot_dec").cast(DoubleType) /
            col("n_parts").cast(DoubleType) * lit(1.3))
        .select(col("l_partkey"),
          col("val_dec").cast(DoubleType).as("part_value"))
        .orderBy("l_partkey")
    },
    Some(s"""
      WITH per_part AS (
        SELECT l_partkey,
               SUM(${Exact.sqlMoney("l_extendedprice")}) AS val_dec
        FROM lineitem GROUP BY l_partkey),
      tot AS (SELECT SUM(val_dec) AS tot_dec, COUNT(*) AS n_parts
              FROM per_part)
      SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
      FROM per_part, tot
      WHERE CAST(val_dec AS DOUBLE)
              > CAST(tot_dec AS DOUBLE) / CAST(n_parts AS DOUBLE) * 1.3
      ORDER BY l_partkey""")
  )

  /** TPC-H Q18 shape — LARGE-VOLUME orders: aggregate lineitem per order
    * FIRST (HAVING sum(qty) > threshold), then join the few qualifying
    * orderkeys back to orders ⋈ customer. The point at scale is the
    * ORDER of operations: the fact table collapses to qualifying keys
    * before any join touches it — pre-aggregation as join pruning (the
    * dual of q28's bloom pruning). Quantity sums take the exact decimal
    * detour, so the HAVING cut is bit-deterministic at the boundary.
    *
    * The qualifying side carries NO broadcast hint on purpose: the
    * qualifying FRACTION is roughly constant in TPC-H-shaped data, so the
    * key set grows linearly with scale — a forced hint would bypass AQE's
    * size check and commit the driver to materializing millions of
    * (key, sum) rows at 100 TB. Unhinted, AQE broadcasts at runtime when
    * the aggregate output is actually small and falls back to a keyed
    * shuffle join (both sides hashed on orderkey) when it isn't — the
    * right plan at every scale, chosen from observed sizes. PlanSpec pins
    * that the static plan stays size-adaptive (no unconditional
    * BroadcastExchange over the fact aggregate).
    */
  val q60LargeOrders: QueryDef = QueryDef(
    "q60_large_orders",
    (s, dir) => {
      val qualifying = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(Exact.dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 175.0)
      Tables.load(s, dir, "orders")
        .join(qualifying,
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
      FROM (SELECT l_orderkey, ${Exact.sqlSum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY l_orderkey) q
      JOIN orders ON o_orderkey = q.l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE sum_qty > 175.0
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")
  )

  /** TPC-H Q21 shape — SOLE LATE SHIPPER: suppliers who, on finished
    * multi-supplier orders, were the only one to ship late (> 60 days
    * after the order date), counted and ranked. The textbook phrasing is
    * EXISTS + NOT-EXISTS correlated self-joins on the fact table — three
    * lineitem scans and two join explosions. The Spark-first re-expression
    * does it with ZERO self-joins: one orderkey-keyed fact-fact join
    * (lineitem ⋈ orders for the order date and status), then two STACKED
    * aggregations — per (order, supplier) late flags, then per order
    * {supplier count, late count, the single late supplier} — where the
    * orderkey hash partitioning laid down by the join satisfies BOTH
    * grouping sets ((orderkey, suppkey) ⊇ orderkey and orderkey itself),
    * so neither aggregate adds an exchange. The EXISTS ("another supplier
    * on the order") and NOT-EXISTS ("no other late supplier") collapse
    * into `n_supp > 1 AND n_late = 1`.
    *
    * At 100 TB: two fact shuffles (each side of the orderkey join),
    * everything after is exchange-free until the final per-supplier
    * count (a third, tiny shuffle over one row per qualifying order) and
    * a TakeOrdered top-20. The supplier dim broadcasts.
    */
  val q61SoleLateShipper: QueryDef = QueryDef(
    "q61_sole_late_shipper",
    (s, dir) => {
      val late = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          // timestamp interval arithmetic (the columns are timestamps;
          // date_add would silently truncate to day precision)
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
            .otherwise(0).as("late"))
      val perSupp = late.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("late")).as("late"))
      val perOrder = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
          max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
      perOrder.filter(col("n_supp") > 1 && col("n_late") === 1)
        .groupBy("late_supp")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("late_supp") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },
    Some("""
      WITH j AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'),
      ps AS (SELECT l_orderkey, l_suppkey, MAX(late) AS late
             FROM j GROUP BY 1, 2),
      po AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
                    MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
             FROM ps GROUP BY 1)
      SELECT s_suppkey, s_name, COUNT(*) AS numwait
      FROM po JOIN supplier ON late_supp = s_suppkey
      WHERE n_supp > 1 AND n_late = 1
      GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20""")
  )

  val all: Seq[QueryDef] =
    Seq(q3JoinAgg, q4SemiJoin, q5AntiJoin, q6RegionJoin, q23SkewJoin,
      q27RangeJoin, q28BloomSemijoin, q43ShippingPriority,
      q51CustDistribution, q54ValueConcentration, q60LargeOrders,
      q61SoleLateShipper)
}
