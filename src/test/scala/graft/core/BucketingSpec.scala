package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-location: the join of two co-bucketed tables must plan
  * WITHOUT a shuffle on either side — the property that amortizes one
  * write-time shuffle over every downstream join at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join is exchange-free and correct") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    // small test tables would broadcast, which hides the property under
    // test; at production scale both sides exceed any broadcast threshold
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")

      // correctness vs the plain (shuffled) join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected && expected > 0)

      // aggregation on the bucket key also skips the exchange
      val agg = spark.table("b_lineitem").groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("ShuffleExchange") &&
        !aggPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
