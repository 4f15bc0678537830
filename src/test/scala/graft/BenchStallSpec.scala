package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the r13 bench stall machinery: the stall signature that earns a
  * query bounded retries, and the StreamingQueryProgress phase meter that
  * gives a stalled streaming pass in-artifact attribution (the r12
  * verdict's top task: st2_stream_join's 28 s driver pass vs its 2.3 s
  * floor set the suite headline with nothing naming WHERE it stalled).
  */
class BenchStallSpec extends SparkSpec {

  test("stallSuspect fires on a contaminated median, not on one bad pass") {
    // the r12 driver case: 2 of 3 passes stalled — median contaminated
    assert(Bench.stallSuspect(Seq(2.30, 15.62, 28.42)))
    // ONE stalled pass: median already robust, no retry needed
    assert(!Bench.stallSuspect(Seq(2.30, 2.35, 28.42)))
    // quiet spread
    assert(!Bench.stallSuspect(Seq(2.30, 2.35, 2.40)))
    // amortized-query shape: big FIRST pass (cache build), steady rest —
    // median sits on a steady pass, must not retry
    assert(!Bench.stallSuspect(Seq(10.0, 0.5, 0.6)))
    // micro-noise: ratio over the bar but absolute excess under the
    // floor — retrying 0.2 s queries is pure churn
    assert(!Bench.stallSuspect(Seq(0.05, 0.22, 0.25)))
    // retries APPEND samples: two clean retries flip the verdict
    assert(Bench.stallSuspect(Seq(2.30, 15.62, 28.42, 2.35)))
    assert(!Bench.stallSuspect(Seq(2.30, 15.62, 28.42, 2.35, 2.40)))
    assert(!Bench.stallSuspect(Seq.empty))
    assert(!Bench.stallSuspect(Seq(5.0)))
    // full-burst recovery arithmetic (why MaxStallRetries = 4): all 3
    // passes stalled, quiet retries appended — the upper median stays on
    // a stalled sample through 3 retries and lands quiet at the 4th
    assert(Bench.stallSuspect(Seq(20.0, 21.0, 22.0, 0.5, 0.5, 0.5)))
    assert(!Bench.stallSuspect(Seq(20.0, 21.0, 22.0, 0.5, 0.5, 0.5, 0.5)))
    assert(Bench.MaxStallRetries >= 4)
  }

  test("sustainedStallSuspect fires when every pass is slow against the prior") {
    // the r13 curated case: m8's three passes 11.4-39.4 s, prior 0.41 s —
    // stallSuspect silent (min also stalled), prior hint fires
    val m8 = Seq(11.3981, 23.3622, 39.3853)
    assert(!Bench.stallSuspect(m8))
    assert(Bench.sustainedStallSuspect(m8, Some(0.405)))
    // no prior → no hint (the pre-hint behavior exactly)
    assert(!Bench.sustainedStallSuspect(m8, None))
    // a fast min means the plain signature owns the verdict
    assert(!Bench.sustainedStallSuspect(Seq(0.42, 23.4, 39.4), Some(0.405)))
    // micro-queries: ratio over the bar, absolute excess under the floor
    assert(!Bench.sustainedStallSuspect(Seq(0.9), Some(0.2)))
    // a genuine 2x regression is NOT a stall
    assert(!Bench.sustainedStallSuspect(Seq(0.8, 0.82, 0.85), Some(0.4)))
    // degenerate priors never fire
    assert(!Bench.sustainedStallSuspect(m8, Some(0.0)))
    assert(!Bench.sustainedStallSuspect(Seq.empty, Some(0.4)))
  }

  test("priorMedians parses the curated artifact and degrades to empty") {
    val dir = java.nio.file.Files.createTempDirectory("bench-prior").toString
    // absent file
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.1").isEmpty)
    val p = java.nio.file.Paths.get(dir, "BENCH_local.json")
    // the full-artifact shape: queries map first, other numeric maps after
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":86.5,"queries":{"q1_agg":0.6907,""" +
        """"m8_h264_video":0.405,"st2_stream_join":2.383},""" +
        """"sf":"/root/testdata/sf0.1",""" +
        """"spread":{"q1_agg":{"min":0.6,"max":0.9}}}""")
    val m = Bench.priorMedians(dir, "/root/testdata/sf0.1")
    assert(m == Map("q1_agg" -> 0.6907, "m8_h264_video" -> 0.405,
      "st2_stream_join" -> 2.383))
    // an artifact measured at a DIFFERENT sf is no prior: a 10× data
    // scale puts every query over the ratio legitimately
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.01").isEmpty)
    // a failed query's null median is skipped, not parsed as a number
    java.nio.file.Files.writeString(p,
      """{"queries":{"q1_agg":0.5,"m8_h264_video":null},""" +
        """"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.1") == Map("q1_agg" -> 0.5))
    // malformed JSON degrades to no hint, never throws
    java.nio.file.Files.writeString(p, """{"queries":{"q1":""")
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.1").isEmpty)
    java.nio.file.Files.writeString(p, "not json at all")
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.1").isEmpty)
    // exponent-notation numbers parse EXACTLY (the r13 reader truncated
    // "1.2E-4" at the 'E' and yielded 1.2 — a silently-wrong prior 10⁴×
    // too big, which would mute every sustained-stall retry on that query)
    java.nio.file.Files.writeString(p,
      """{"queries":{"q_tiny":1.2E-4,"q_cap":3.5e2,"q_plus":4.0E+1,""" +
        """"q_plain":0.75},"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.priorMedians(dir, "/root/testdata/sf0.1") == Map(
      "q_tiny" -> 1.2e-4, "q_cap" -> 350.0, "q_plus" -> 40.0,
      "q_plain" -> 0.75))
  }

  test("StreamMeter attributes trigger phases and state-store time per mark window") {
    val session = spark
    import session.implicits._
    implicit val sq = spark.sqlContext
    val meter = new Bench.StreamMeter
    spark.streams.addListener(meter)
    try {
      meter.mark() // drain anything a prior suite's stream left behind
      val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("id", "kind")
        .groupBy("kind").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("bench_stall_meter")
        .outputMode("complete").start()
      try {
        in.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        in.addData((3L, "a"))
        q.processAllAvailable()
      } finally q.stop()
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
      val (triggers, phases) = meter.mark()
      assert(triggers >= 2, s"expected >=2 triggers, saw $triggers")
      // the wall-clock attribution the artifact needs: trigger execution
      // and the stateful aggregation's state-store commit both present
      assert(phases.contains("triggerExecution"), phases.toString)
      assert(phases.contains("addBatch"), phases.toString)
      assert(phases.contains("state.commit"), phases.toString)
      // and the window RESETS: a second mark with no stream activity is
      // empty, so per-pass records never bleed into each other
      val (t2, p2) = meter.mark()
      assert(t2 == 0L && p2.isEmpty)
    } finally spark.streams.removeListener(meter)
  }
}
