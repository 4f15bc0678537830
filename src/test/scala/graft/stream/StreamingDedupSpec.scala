package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming dedup: in-stream watermarked dedup and the corpus-lifetime
  * first-seen ledger, including cross-batch duplicates.
  */
class StreamingDedupSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  private def t(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  test("withinStream drops duplicates inside the watermark horizon") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val out = StreamingDedup.withinStream(in.toDF(), "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_within")
      .outputMode("append").start()
    in.addData(Doc(1, t(0), "alpha"), Doc(2, t(1), "beta"),
      Doc(3, t(2), "alpha")) // dup within one batch
    q.processAllAvailable()
    in.addData(Doc(4, t(3), "beta")) // dup across batches, inside horizon
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("sd_within").select("text").collect().map(_.getString(0))
    assert(texts.sorted.toSeq == Seq("alpha", "beta"))
  }

  test("firstSeenSink: ledger-exact dedup across batches and restarts") {
    val base = Files.createTempDirectory("graft-sdedup")
    val ledger = base.resolve("ledger").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    def drain(): Unit = {
      val q = StreamingDedup.firstSeenSink(in.toDF(), "text", ledger, out, ckpt)
      try {
        q.processAllAvailable()
      } finally q.stop()
    }

    in.addData(Doc(1, t(0), "alpha"), Doc(2, t(1), "beta"), Doc(3, t(2), "alpha"))
    drain()
    in.addData(Doc(4, t(3), "beta"), Doc(5, t(4), "gamma")) // beta is corpus-dup
    drain()

    val kept = spark.read.parquet(out)
    assert(kept.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))
    // first arrival wins: beta kept from doc 2, not doc 4
    assert(kept.filter(col("text") === "beta").collect()(0).getAs[Long]("doc_id") == 2L)
    // the ledger carries digests only
    assert(spark.read.parquet(ledger).columns.toSet == Set("content_key", "batch_id"))
    assert(spark.read.parquet(ledger).count() == 3)
  }

  // Pins the ledger probe resolving through the path's OWN filesystem: a
  // URI-form ledger path (file:/...) is invisible to java.io.File — the old
  // probe read such a ledger as absent and re-admitted every corpus
  // duplicate. On a real cluster (hdfs://, s3://) that was EVERY path.
  test("firstSeenSink honors a URI-form ledger path across restarts") {
    val base = Files.createTempDirectory("graft-sdedup-uri")
    val ledger = "file:" + base.resolve("ledger")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    def drain(): Unit = {
      val q = StreamingDedup.firstSeenSink(in.toDF(), "text", ledger, out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    in.addData(Doc(1, t(0), "alpha"))
    drain()
    in.addData(Doc(2, t(1), "alpha")) // corpus-dup, only the ledger knows
    drain()

    val kept = spark.read.parquet(out)
    assert(kept.count() == 1 && kept.collect()(0).getAs[Long]("doc_id") == 1L)
  }

  // Pins the committed-data ledger probe (graft.core.DataDir): a ledger
  // dir holding ONLY a crashed first batch's staging leftovers must read
  // as "no ledger yet", not fail schema inference on every replay — the
  // permanent-wedge class the crash fuzz found on Catalog.publish.
  test("firstSeenSink: a staging-only ledger dir reads as empty, not a wedge") {
    val base = Files.createTempDirectory("graft-sdedup-wedge")
    val ledger = base.resolve("ledger")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    // what a crashed first write leaves behind: scratch dirs, no data
    Files.createDirectories(ledger.resolve(".spark-staging-deadbeef"))
    Files.createDirectories(ledger.resolve("_temporary").resolve("0"))

    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    in.addData(Doc(1, t(0), "alpha"), Doc(2, t(1), "alpha"))
    val q = StreamingDedup.firstSeenSink(in.toDF(), "text", ledger.toString,
      out, ckpt)
    try q.processAllAvailable() finally q.stop()

    val kept = spark.read.parquet(out)
    assert(kept.count() == 1 && kept.collect()(0).getAs[Long]("doc_id") == 1L)
    assert(spark.read.parquet(ledger.toString).count() == 1)
  }
}
