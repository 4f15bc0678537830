package graft.stream

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** st2: the bounded stream-stream interval join must equal the batch
  * interval join over the same rows — pair for pair.
  */
class StreamJoinSpec extends SparkSpec {

  test("st2: streaming pairs equal the batch interval join") {
    val streamed = StreamQueries.st2StreamJoin.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us"),
        col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("t_us").as("p_t"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("t_us").as("c_t"))
    val batch = p.join(c, col("user_id") === col("c_user") &&
        col("c_t") >= col("p_t") - 86400000000L && col("c_t") <= col("p_t"))
      .select("p_id", "c_id", "user_id").orderBy("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("st3: doubled delivery collapses to the exact base aggregate") {
    val out = StreamQueries.st3StreamDedup.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val base = Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == base.toSeq)
    // the duplicated union really delivered 2x rows upstream of dedup:
    // without exactly-once state every n (and checksum) would be doubled,
    // so equality with the base aggregate is the proof
    assert(out.map(_._2).sum == Tables.load(spark, sf, "events").count())
  }
}
