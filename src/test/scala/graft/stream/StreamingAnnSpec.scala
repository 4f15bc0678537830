package graft.stream

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving: per-batch results equal the batch LSH search,
  * replays are idempotent, and the corpus index is computed once.
  */
class StreamingAnnSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("streamed query batches match the batch LSH search exactly") {
    implicit val sq = spark.sqlContext
    val corpus = Tables.load(spark, sf, "embeddings")
    val indexed = StreamingAnn.indexCorpus(corpus).cache()
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-sann").toString

      val queries = corpus.filter(col("vec_id") < 6)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq

      def serve(ckpt: String): Unit = {
        val stream = MemoryStream[(Long, Array[Float])]
        stream.addData(queries)
        StreamingAnn.start(
          stream.toDF().toDF("vec_id", "embedding"), indexed,
          s"$out/hits", s"$out/$ckpt", drain = true).awaitTermination()
      }

      serve("ckpt")
      val expect = StreamingAnn.searchBatch(
        corpus.filter(col("vec_id") < 6), indexed)
        .orderBy("query_id", "rank").collect().map(_.toSeq.take(4))
      def readHits() = spark.read.parquet(s"$out/hits")
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      assert(readHits().toSeq == expect.toSeq)
      assert(expect.nonEmpty) // bucket-local hits exist for these queries

      // an at-least-once REPLAY of the same batch overwrites its own
      // batch_id partition — no duplicated hits in the output
      serve("ckpt-replay")
      assert(readHits().toSeq == expect.toSeq)
    } finally { indexed.unpersist(); () }
  }
}
