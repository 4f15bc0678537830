package graft.queries

import graft.SparkSpec

class RelationalQueriesSpec extends SparkSpec {

  test("q1_agg: 6 groups, exact row shape, deterministic across partitionings") {
    val df = RelationalQueries.q1Agg.fn(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0 && rows.length <= 8)
    assert(df.columns.toSeq == Seq(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
      "count_order"))
    // exactness: same result regardless of partitioning
    val repart = graft.core.Tables.load(spark, sf, "lineitem").repartition(13)
    repart.createOrReplaceTempView("li13")
    val again = RelationalQueries.q1Agg.fn(spark, sf).collect()
    assert(rows.sameElements(again))
  }

  test("every registered query runs and is non-empty at sf0.001") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
