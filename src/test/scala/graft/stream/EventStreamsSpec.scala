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
}
