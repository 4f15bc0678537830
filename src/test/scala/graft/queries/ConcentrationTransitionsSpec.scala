package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ConcentrationTransitionsSpec extends SparkSpec {

  test("q54: exactly the parts above 1.3x the mean value survive") {
    val out = JoinQueries.q54ValueConcentration.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val per = Tables.load(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(graft.core.Exact.money(col("l_extendedprice"))).as("v"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val exactTotal = per.map(_._2).reduce(_ add _).doubleValue()
    val threshold = exactTotal / per.length * 1.3
    val expect = per.filter(_._2.doubleValue() > threshold).map(_._1).toSet
    assert(out.keySet == expect)
    assert(out.nonEmpty && out.size < per.length) // threshold does work
  }

  test("f8: transition matrix equals driver recompute; rows normalize") {
    val out = graft.flows.FlowQueries.f8Transitions.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val ev = Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(out.keySet == counts.keySet)
    out.foreach { case ((f, t), (n, rt, p)) =>
      assert(n == counts((f, t)))
      assert(rt == rowTot(f))
      assert(p == n.toDouble / rt.toDouble) // same IEEE division
    }
    // each from-row's probabilities sum to ~1 (pure rational check: ns sum to total)
    out.groupBy(_._1._1).foreach { case (f, cells) =>
      assert(cells.values.map(_._1).sum == rowTot(f))
    }
  }
}
