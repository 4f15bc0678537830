package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q48/q49/q50 semantics, checked against independent brute-force
  * recomputations (single-window sweep, per-purchase scan) that would be
  * wrong to SHIP but are fine as oracles at sf0.001.
  */
class SweepAttributionSpec extends SparkSpec {

  test("q48: grouping sets emit exactly the three requested sets") {
    val rows = RelationalQueries.q48GroupingSets.fn(spark, sf).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    // bit 0 = l_linestatus aggregated, bit 1 = l_returnflag aggregated:
    // (rf, ls) -> 0, (ls) -> 2, () -> 3; the rollup-only set (rf) -> 1
    // must NOT appear — that's what distinguishes this from q18.
    assert(gids == Set(0L, 2L, 3L))
    val total = Tables.load(spark, sf, "lineitem").count()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    // the (ls)-only slice partitions the table
    val lsSlice = rows.filter(_.getAs[Long]("gid") == 2L)
    assert(lsSlice.map(_.getAs[Long]("n")).sum == total)
  }

  test("q49: two-pass sweep equals the single-window brute force") {
    val out = EventQueries.q49Concurrency.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: one global ordered pass over all deltas on the driver
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), expr("ts div 1000"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val usPerHour = 3600L * 1000L * 1000L
    val deltas = ev.flatMap { case (id, ts, v) =>
      val end = ts + math.floor(v * 60.0).toLong * 1000000L + 1L
      Seq((ts, 1L, id), (end, -1L, id))
    }.sortBy(identity)
    var conc = 0L
    val perHour = scala.collection.mutable.Map[Long, (Long, Long)]()
    deltas.foreach { case (t, d, _) =>
      conc += d
      val h = t / usPerHour
      val (mx, ns) = perHour.getOrElse(h, (Long.MinValue, 0L))
      perHour(h) = (math.max(mx, conc), ns + (if (d == 1L) 1L else 0L))
    }
    val expect = perHour.toSeq.map { case (h, (mx, ns)) => (h, mx, ns) }.sorted
    assert(out.toSeq == expect)
    // every interval opens and closes: total starts == |events|
    assert(out.map(_._3).sum == ev.length)
  }

  test("q53: fan-out sliding distinct equals the per-hour set recompute") {
    val out = EventQueries.q53SlidingDistinct.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nsPerHour = 3600L * 1000L * 1000L * 1000L
    val pairs = Tables.load(spark, sf, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / nsPerHour)).distinct
    val expect = pairs.flatMap { case (u, h) => Seq((u, h), (u, h + 1), (u, h + 2)) }
      .distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(out == expect)
    // trailing-3h distinct is >= the plain hourly distinct everywhere
    val hourly = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    hourly.foreach { case (h, n) => assert(out(h) >= n) }
  }

  test("q50: channels partition the purchases; brute-force agrees") {
    val out = EventQueries.q50Attribution.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet.subsetOf(Set("click", "view", "direct")))
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase")
    assert(out.values.sum == purchases.length)
    val lookback = 7L * 24L * 3600L * 1000000L
    val byUser = ev.groupBy(_._2)
    val expect = purchases.map { case (pid, u, pts, _) =>
      val prior = byUser(u)
        .filter(e => Set("click", "view")(e._4) &&
          (e._3 < pts || (e._3 == pts && e._1 < pid)))
      if (prior.isEmpty) "direct"
      else {
        val last = prior.maxBy(e => (e._3, e._1))
        if (pts - last._3 <= lookback) last._4 else "direct"
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out == expect)
  }
}
