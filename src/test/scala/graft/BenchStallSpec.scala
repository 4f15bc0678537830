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
