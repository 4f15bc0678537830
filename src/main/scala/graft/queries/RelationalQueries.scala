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
      val disc = money(col("l_extendedprice")) *
        money(lit(1.0) - col("l_discount"))
      val charge = disc.cast(DecimalType(18, 4)) *
        money(lit(1.0) + col("l_tax"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(disc).cast(DoubleType).as("sum_disc_price"),
          sum(charge).cast(DoubleType).as("sum_charge"),
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

  val all: Seq[QueryDef] = Seq(q1Agg)
}
