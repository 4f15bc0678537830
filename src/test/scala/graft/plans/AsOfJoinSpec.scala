package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The custom as-of join operator: plan shape (exec + exchanges +
  * sorts), agreement with the tag-union-window composition (q16), outer
  * nulls, and tie-break semantics.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def clicks = Tables.load(spark, sf, "events")
    .filter(col("event_type") === "click")
    .select(col("user_id").as("cu"), col("ts").as("ct"),
      col("event_id").as("click_id"))

  private def purchases = Tables.load(spark, sf, "events")
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))

  test("plans as AsOfJoinExec with key exchanges and (key, time) sorts") {
    val df = AsOf.lastBefore(clicks, purchases,
      "cu", "ct", "click_id", "user_id", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("matches the tag-union-window composition on real events") {
    val got = AsOf.lastBefore(clicks, purchases,
      "cu", "ct", "click_id", "user_id", "ts")
      .filter(col("click_id").isNotNull)
      .select(col("purchase_id"), col("click_id"), col("ct"))
      .as[(Long, Long, Long)].collect().toSet
    // q16's output is µs-truncated; rebuild the same reference directly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("tag"), col("click_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tagged = clicks
      .select(col("cu").as("user_id"), col("ct").as("ts"), lit(0).as("tag"),
        col("click_id"), lit(null).cast("long").as("purchase_id"))
      .unionByName(purchases.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("click_id"), col("purchase_id")))
    val want = tagged
      .withColumn("last_click",
        last(when(col("tag") === 0,
          struct(col("ts").as("ct"), col("click_id").as("cid"))), ignoreNulls = true)
          .over(w))
      .filter(col("tag") === 1 && col("last_click").isNotNull)
      .select(col("purchase_id"), col("last_click.cid"), col("last_click.ct"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty, s"sizes: got ${got.size} want ${want.size}")
  }

  test("right rows with no earlier left row emit nulls (left outer)") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val r = Seq((1L, 50L, 90L), (1L, 150L, 91L), (2L, 500L, 92L))
      .toDF("k", "t", "pid")
    val rows = AsOf.lastBefore(l, r, "k", "t", "id", "k", "t")
      .select(col("pid"), col("id"))
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    // pid 90 precedes the only click; pid 92 is another key entirely
    assert(rows == Set((90L, -1L), (91L, 10L), (92L, -1L)))
  }

  test("equal-time ties resolve to the largest tie id; equal time matches") {
    val l = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L))
      .toDF("k", "t", "id")
    val r = Seq((1L, 100L, 90L)).toDF("k", "t", "pid")
    val rows = AsOf.lastBefore(l, r, "k", "t", "id", "k", "t")
      .select(col("pid"), col("id")).as[(Long, Long)].collect().toSet
    assert(rows == Set((90L, 9L)))
  }

  test("timestamp time columns keep MICROSECOND precision (not seconds)") {
    // the two left rows differ only in the sub-second part: a cast to
    // long (seconds) would merge them and also let the t=….000300 right
    // row match the later click
    val l = Seq((1, "2024-01-01 00:00:00.000100", 10L),
      (1, "2024-01-01 00:00:00.000400", 11L))
      .toDF("k", "ts", "id")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = Seq((1, "2024-01-01 00:00:00.000300", 90L),
      (1, "2024-01-01 00:00:00.000500", 91L))
      .toDF("k", "ts", "pid")
      .withColumn("ts", to_timestamp(col("ts")))
    val rows = AsOf.lastBefore(l, r, "k", "ts", "id", "k", "ts")
      .select(col("pid"), col("id")).as[(Long, Long)].collect().toSet
    assert(rows == Set((90L, 10L), (91L, 11L)))
    // helper columns must not leak into the caller-visible schema
    val cols = AsOf.lastBefore(l, r, "k", "ts", "id", "k", "ts").columns
    assert(!cols.exists(_.startsWith("__asof_")), cols.mkString(","))
  }

  test("integer keys and date times adapt via order-preserving casts") {
    val l = Seq((1, "2024-01-10", 10L), (1, "2024-03-01", 11L))
      .toDF("k", "d", "id").withColumn("d", to_date(col("d")))
    val r = Seq((1, "2024-02-15", 90L)).toDF("k", "d", "pid")
      .withColumn("d", to_date(col("d")))
    val rows = AsOf.lastBefore(l, r, "k", "d", "id", "k", "d")
      .select(col("pid"), col("id")).as[(Long, Long)].collect().toSet
    assert(rows == Set((90L, 10L)))
  }

  test("both sides from one DataFrame: left columns bind to LEFT values") {
    // duplicate expression ids across children would make the output
    // projection silently read right-side values for left columns
    val base = Seq((1L, 100L, 7L), (1L, 100L, 9L)).toDF("k", "t", "id")
    val rows = AsOf.lastBefore(base, base, "k", "t", "id", "k", "t")
      .toDF("rk", "rt", "rid", "lk", "lt", "lid")
      .select(col("rid"), col("lid")).as[(Long, Long)].collect().toSet
    // every right row's as-of match is the LARGEST tie (9), regardless of
    // its own id — rid==lid for rid=7 would be the exprId-aliasing bug
    assert(rows == Set((7L, 9L), (9L, 9L)))
  }

  test("NULL keys and times never match and never derail the merge") {
    // nulls sort FIRST: an unguarded getLong would read a null key as 0,
    // falsely matching genuine key-0 rows and skipping past negative keys
    val l = Seq[(Option[Long], Option[Long], Long)](
      (None, Some(10L), 1L),     // null key: matches nothing
      (Some(0L), None, 2L),      // null time: matches nothing
      (Some(-5L), Some(10L), 3L),
      (Some(0L), Some(10L), 4L))
      .toDF("k", "t", "id")
    val r = Seq[(Option[Long], Option[Long], Long)](
      (None, Some(20L), 101L),   // null right key: unmatched
      (Some(-5L), Some(20L), 102L), // must find id=3 despite null-first rows
      (Some(0L), Some(20L), 103L),  // must find id=4, NOT the null-key row
      (Some(7L), None, 104L))    // null right time: unmatched
      .toDF("k", "t", "id")
    val got = AsOf.lastBefore(l, r, "k", "t", "id", "k", "t")
      .toDF("rk", "rt", "rid", "lk", "lt", "lid")
      .select(col("rid"), col("lid")).collect()
      .map(row => row.getLong(0) -> Option(row.get(1)).map(_.toString.toLong))
      .toMap
    assert(got == Map(101L -> None, 102L -> Some(3L), 103L -> Some(4L),
      104L -> None), got.toString)
  }

  test("output keeps the right child's partitioning: no exchange above") {
    // the merge is order/partition-preserving — a groupBy on the join key
    // directly above must reuse the as-of join's exchange, not add one
    val df = AsOf.lastBefore(clicks, purchases,
      "cu", "ct", "click_id", "user_id", "ts")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one exchange per as-of child (2 total); the groupBy adds none
    assert(exchanges <= 2, plan)
  }

  test("inputs carrying a reserved __asof_ column are rejected") {
    val l = Seq((1L, 2L, 3L, 4L)).toDF("k", "t", "id", "__asof_x")
    intercept[IllegalArgumentException] {
      AsOf.lastBefore(l, l.drop("__asof_x"), "k", "t", "id", "k", "t")
    }
  }
}
