package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming window + stateful-session tests over a MemoryStream. */
class EventStreamsSpec extends SparkSpec {

  import EventStreams._

  private val HourUs = 3600L * 1000000L

  test("windowedCounts: tumbling windows with watermark") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[Event]
    // two events in hour 0, one in hour 1 (epoch-aligned)
    in.addData(
      Event(1, 10L * 1000000, 1, "click", 1.0),
      Event(2, 20L * 1000000, 2, "click", 2.0),
      Event(3, HourUs + 5L * 1000000, 1, "view", 3.0))

    val q = windowedCounts(in.toDF().withColumn("ts", col("ts_us") * 1000),
      watermark = "5 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w_start").getTime / 1000,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    assert(rows == Set((0L, "click", 2L), (3600L, "view", 1L)))
  }

  test("clickAttribution: stream-stream interval join, inner + outer") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    final case class Click(user_id: Long, click_id: Long, ts_us: Long)
    final case class Purchase(user_id: Long, purchase_id: Long, ts_us: Long)

    val clicks = MemoryStream[(Long, Long, Long)]
    val purchases = MemoryStream[(Long, Long, Long)]
    val cDf = clicks.toDF().toDF("user_id", "click_id", "ts_us")
    val pDf = purchases.toDF().toDF("user_id", "purchase_id", "ts_us")

    // user 1: click at t=100s and t=150s, purchase at t=160s (window 60s →
    // both match); user 2: click at t=0, purchase at t=300s (outside window);
    // user 3: purchase with no click at all
    clicks.addData((1L, 11L, 100L * 1000000), (1L, 12L, 150L * 1000000),
      (2L, 21L, 0L))
    purchases.addData((1L, 91L, 160L * 1000000), (2L, 92L, 300L * 1000000),
      (3L, 93L, 200L * 1000000))

    val q = EventStreams.clickAttribution(cDf, pDf, windowUs = 60L * 1000000,
      lateness = "1 minute", joinType = "leftOuter")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // advance both watermarks far past every purchase so outer rows flush
    clicks.addData((9L, 99L, 10000L * 1000000))
    purchases.addData((9L, 99L, 10000L * 1000000))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)))
      .filter(_._1 <= 93L).toSet // drop the watermark-advance sentinels
    // purchase 91 attributes to both in-window clicks; 92 and 93 flush
    // unattributed once the watermark proves no click can match
    assert(rows == Set((91L, Some(11L)), (91L, Some(12L)),
      (92L, None), (93L, None)), rows.toString)
  }

  test("stream-static enrichment: dimension broadcast-joins into the stream") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    // static dimension: user tier — the slowly-changing lookup every
    // event stream enriches against; joins stream-side with no state
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    in.addData(
      Event(1, 1000L, 1, "click", 1.0),
      Event(2, 2000L, 2, "click", 2.0),
      Event(3, 3000L, 9, "click", 3.0)) // no dim row → left join keeps it

    val q = in.toDF()
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("enriched")
      .select("event_id", "tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("dedupWithinWatermark: first occurrence kept, dups dropped") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[Event]
    in.addData(
      Event(1, 1000000, 1, "click", 1.0),
      Event(1, 2000000, 1, "click", 1.0), // dup event_id within window
      Event(2, 3000000, 2, "view", 2.0))

    val q = EventStreams.dedupWithinWatermark(
      in.toDF().withColumn("ts", col("ts_us") * 1000), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_wm").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 2L))
  }

  test("sessionize: gap closes sessions, state accumulates within gap") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapUs = 60L * 1000000) // 60 s gap
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 10 s apart (one session), then a 2nd session far
    // later whose arrival closes the first
    in.addData(
      Event(1, 0, 1, "click", 1.0),
      Event(2, 10L * 1000000, 1, "view", 2.0))
    q.processAllAvailable()
    in.addData(Event(3, 500L * 1000000, 1, "click", 5.0))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sessions").as[Session].collect()
    assert(closed.length == 1)
    val s = closed(0)
    assert(s.user_id == 1 && s.n_events == 2 &&
      s.start_us == 0 && s.end_us == 10L * 1000000 && s.total_value == 3.0)
  }

  // Pins the min/max session envelope: a cross-batch LATE event used to
  // overwrite last_us backwards, so the next on-time event measured its gap
  // from the late timestamp and closed a session with end_us < start_us.
  // A late event WITHIN gapUs of the envelope merges (without regressing
  // the end); the next on-time event still measures from the true end.
  test("sessionize: a late cross-batch event cannot regress the session end") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapUs = 60L * 1000000) // 60 s gap
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append()).start()

    in.addData(Event(1, 100L * 1000000, 1, "click", 1.0))
    q.processAllAvailable()
    // late event 40 s EARLIER than the session start: within gap, extends
    // the envelope backwards
    in.addData(Event(2, 60L * 1000000, 1, "view", 2.0))
    q.processAllAvailable()
    // 40 s after the session's true end: within gap, must merge (the old
    // code measured from the late timestamp and closed a regressed session)
    in.addData(Event(3, 140L * 1000000, 1, "click", 3.0))
    q.processAllAvailable()
    // far future event closes the (single) merged session
    in.addData(Event(4, 10000L * 1000000, 1, "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sessions_late").as[Session].collect()
    assert(closed.length == 1, closed.mkString(","))
    val s = closed(0)
    assert(s.start_us == 60L * 1000000 && s.end_us == 140L * 1000000 &&
      s.n_events == 3 && s.total_value == 6.0, s.toString)
    assert(s.end_us >= s.start_us)
  }

  // Pins the r13 envelope BOUND (ADVICE round 12): before it, ANY event
  // earlier than last_us passed `e.ts_us - s.last_us <= gapUs` trivially
  // (negative difference), so an arbitrarily old straggler merged into the
  // open session — a session whose internal gap exceeded gapUs. Now an
  // event more than gapUs before the session start closes as its OWN
  // session; the open session is untouched.
  test("sessionize: a too-late event outside the envelope gap becomes its own session") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapUs = 60L * 1000000) // 60 s gap
      .writeStream.format("memory").queryName("sessions_toolate")
      .outputMode(OutputMode.Append()).start()

    in.addData(Event(1, 100L * 1000000, 1, "click", 1.0))
    q.processAllAvailable()
    // 90 s before the open session's start — beyond the 60 s gap: must NOT
    // merge (the merged session would carry an internal 90 s > gap hole)
    in.addData(Event(2, 10L * 1000000, 1, "view", 2.0))
    q.processAllAvailable()
    // on-time continuation, then a far-future closer
    in.addData(Event(3, 140L * 1000000, 1, "click", 3.0))
    q.processAllAvailable()
    in.addData(Event(4, 10000L * 1000000, 1, "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sessions_toolate").as[Session].collect()
      .sortBy(_.start_us)
    assert(closed.length == 2, closed.mkString(","))
    val straggler = closed(0)
    assert(straggler.start_us == 10L * 1000000 &&
      straggler.end_us == 10L * 1000000 &&
      straggler.n_events == 1 && straggler.total_value == 2.0,
      straggler.toString)
    val main = closed(1)
    assert(main.start_us == 100L * 1000000 && main.end_us == 140L * 1000000 &&
      main.n_events == 2 && main.total_value == 4.0, main.toString)
  }
}
