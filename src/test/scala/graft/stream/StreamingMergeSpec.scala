package graft.stream

import graft.SparkSpec
import graft.catalog.BucketedMerge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming upsert: a document stream lands in the
  * partition-scoped MERGE catalog through foreachBatch, with batch-id
  * dedup making the sink idempotent — replaying a delivered micro-batch
  * (the at-least-once failure mode) leaves the table unchanged. This is
  * the streaming half of the catalog contract: exactly-once TABLE state
  * on top of an at-least-once stream.
  */
class StreamingMergeSpec extends SparkSpec {

  import spark.implicits._

  test("foreachBatch + BucketedMerge: upserts apply once, replays no-op") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-merge").toString
    val keys = Seq("doc_id")

    val in = MemoryStream[(Long, String)]
    val seenBatches = scala.collection.mutable.Set[Long]()
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // idempotency gate: a redelivered batch id must not re-merge.
        // (production persists this set in the checkpoint dir / table
        // metadata; the in-memory set models the same contract)
        if (seenBatches.add(batchId)) {
          BucketedMerge.mergeInto(batch.sparkSession, dir, batch, keys, nBuckets = 4)
        }
        ()
      }
      .start()

    in.addData((1L, "v1"), (2L, "v1"))
    q.processAllAvailable()
    in.addData((2L, "v2"), (3L, "v1")) // update doc 2, insert doc 3
    q.processAllAvailable()
    q.stop()

    val afterStream = BucketedMerge.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(afterStream == Set((1L, "v1"), (2L, "v2"), (3L, "v1")), afterStream)
    val vAfterStream = BucketedMerge.currentVersion(dir)

    // simulate redelivery of the last batch: the gate makes it a no-op
    val replay = Seq((2L, "v2"), (3L, "v1")).toDF("doc_id", "text")
    if (seenBatches.add(1L)) { // already present → no merge
      BucketedMerge.mergeInto(spark, dir, replay, keys, nBuckets = 4)
    }
    assert(BucketedMerge.currentVersion(dir) == vAfterStream)
    assert(BucketedMerge.read(spark, dir).as[(Long, String)].collect().toSet
      == afterStream)

    // and a genuine new batch still applies
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "v3")).toDF("doc_id", "text"), keys, nBuckets = 4)
    assert(BucketedMerge.read(spark, dir).as[(Long, String)].collect().toSet
      == Set((1L, "v3"), (2L, "v2"), (3L, "v1")))
  }
}
