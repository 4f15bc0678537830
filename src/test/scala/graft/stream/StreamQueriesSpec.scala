package graft.stream

import graft.SparkSpec
import graft.core.{Exact, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** st1 — the oracle-registered streaming replay: final state must equal
  * the batch aggregation bit-for-bit, and the replay must actually be
  * multi-batch (state merged across triggers, not one-shot).
  */
class StreamQueriesSpec extends SparkSpec {

  test("st1 final state equals the batch aggregation exactly") {
    val got = StreamQueries.st1StreamWindows.fn(spark, sf).collect()
    val want = Tables.load(spark, sf, "events")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Exact.money(col("value"))).cast(DoubleType).as("total_value"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("w_start_us", "event_type").collect()
    assert(got.nonEmpty)
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("bounded replays unload their serve-once state providers post-drain") {
    // the racy conf alternative (unloadOnCommit) died once in
    // SparkEntrySpec on exactly this query's four-stores-per-partition
    // commit — the pin is the post-drain contract: after an st query's
    // fn returns, the JVM-shared registry holds NO loaded providers
    // (nothing for the maintenance thread to re-snapshot), and the
    // replay-scoped conf is restored.
    val confKeys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "spark.sql.streaming.stateStore.commitValidation.enabled",
      "spark.sql.streaming.noDataMicroBatches.enabled")
    val confBefore = confKeys.map(k => spark.conf.getOption(k))
    if (spark.streams.active.isEmpty) // order-robust vs earlier suites
      org.apache.spark.sql.graft.StateBridge.unloadAll()
    val got = StreamQueries.st2StreamJoin.fn(spark, sf)
    got.write.format("noop").mode("overwrite").save()
    assert(org.apache.spark.sql.graft.StateBridge.nothingLoaded(),
      "st2 left state-store providers loaded after its drain")
    assert(confKeys.map(k => spark.conf.getOption(k)) == confBefore,
      "replay-scoped conf not restored")
  }

  test("the replay is multi-batch (file-per-trigger over a split layout)") {
    // the fixture layout drives maxFilesPerTrigger=2 towards multi-batch
    // replay; at least two data files must exist for the claim to hold
    StreamQueries.st1StreamWindows.fn(spark, sf).collect()
    // resolve THIS corpus's replay dir through the cache — a tmpdir
    // prefix scan picks up other suites' replay fixtures (a tiny
    // synthetic corpus lays out as one file) depending on suite order
    val split = java.nio.file.Paths.get(
      StreamQueries.splitEvents(spark, sf)).getParent
    assert(split != null, "replay fixture dir missing")
    val files = java.nio.file.Files.list(split.resolve("events"))
    val nParquet = try {
      val it = files.iterator()
      var n = 0
      while (it.hasNext) if (it.next().getFileName.toString.endsWith(".parquet")) n += 1
      n
    } finally files.close()
    assert(nParquet >= 2, s"expected a multi-file replay layout, got $nParquet")
  }

  test("st4 drops exactly the planted late rows, and accounts for them") {
    val got = StreamQueries.st4LateData.fn(spark, sf).collect()
    assert(got.nonEmpty)
    // planted late file = a copy of the stream's first event-time hour
    val ev = Tables.load(spark, sf, "events")
      .select(expr("ts div 1000").as("us"))
    val firstHourUs = ev.agg(min(col("us"))).head.getLong(0) /
      3600000000L * 3600000000L
    val planted = ev
      .filter(col("us") >= firstHourUs && col("us") < firstHourUs + 3600000000L)
      .count()
    assert(planted > 0)
    assert(StreamQueries.st4Dropped.get() == planted,
      s"watermark dropped ${StreamQueries.st4Dropped.get()}, planted $planted")
    // and none of the emitted windows contains a planted id's contribution:
    // the first-hour window must carry exactly its ON-TIME count
    val firstWindowN = got.filter(_.getAs[Long]("w_start_us") == firstHourUs)
      .map(_.getAs[Long]("n")).sum
    val onTimeFirstHour = planted // the late file duplicated every row once
    assert(firstWindowN == onTimeFirstHour)
  }

  test("st6 streamed ANN serving equals the one-shot batch LSH search") {
    val got = StreamQueries.st6StreamingAnn.fn(spark, sf).collect()
    assert(got.nonEmpty)
    val corpus = Tables.load(spark, sf, "embeddings")
    val want = StreamingAnn.searchBatch(
      corpus.filter(col("vec_id") < 20),
      StreamingAnn.indexCorpus(corpus), topK = 10)
      .orderBy("query_id", "rank").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("st5 custom state equals batch gap-sessionization for every user") {
    val got = StreamQueries.st5StatefulSessions.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"))).toMap
    assert(got.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    val want = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (lit(1) + sum(when(col("gap") > 1800000000L, 1L).otherwise(0L)))
          .as("n_sessions"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"))).toMap
    assert(got == want)
  }
}
