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

  test("c5: clean edges report zero orphans; the planted edge does not") {
    val out = graft.catalog.CatalogQueries.c5FkAudit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 6)
    val clean = out.view.filterKeys(_ != "orders.even_customer").toMap
    clean.values.foreach { case (_, orphans) => assert(orphans == 0L) }
    val (nOrders, nOrphans) = out("orders.even_customer")
    assert(nOrphans > 0 && nOrphans < nOrders) // planted edge fires
    // brute check the planted edge
    val even = Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val orphBrute = Tables.load(spark, sf, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
      .count(k => !even(k))
    assert(nOrphans == orphBrute)
  }

  test("q56: mode is the true argmax with smallest-value tie-break") {
    val out = RelationalQueries.q56Mode.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    val rows = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.groupBy(_._1).foreach { case (rf, vs) =>
      val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.minBy { case (q, c) => (-c, q) }
      assert(out(rf) == (best._1, best._2, counts.size.toLong))
    }
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
