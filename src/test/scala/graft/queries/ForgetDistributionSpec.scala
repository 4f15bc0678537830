package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ForgetDistributionSpec extends SparkSpec {

  test("q51: distribution accounts for every customer and every order") {
    val rows = JoinQueries.q51CustDistribution.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.load(spark, sf, "customer").count()
    assert(rows.map(_._2).sum == nCust) // every customer in exactly one bin
    val nOrders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") =!= "F")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows.map(r => r._1 * r._2).sum == nOrders) // counts conserve orders
  }

  test("c4: audit is internally consistent and matches plain anti-joins") {
    val out = graft.catalog.CatalogQueries.c4Forget.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set("customer", "orders", "lineitem"))
    out.values.foreach { case (before, purged, after) =>
      assert(after == before - purged && purged >= 0)
    }
    val customer = Tables.load(spark, sf, "customer")
    val orders = Tables.load(spark, sf, "orders")
    val forget = customer.filter(col("c_custkey") % 97 === 0)
    val po = orders.join(forget, col("o_custkey") === col("c_custkey"),
      "left_semi")
    val pl = Tables.load(spark, sf, "lineitem")
      .join(po, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(out("customer")._2 == forget.count())
    assert(out("orders")._2 == po.count())
    assert(out("lineitem")._2 == pl.count())
    assert(out("customer")._2 > 0) // the forget set is non-trivial
  }
}
