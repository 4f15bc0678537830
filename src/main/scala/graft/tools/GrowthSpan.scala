package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-decade shuffle-growth audit (bench-side dev tool; the driver's
  * testdata tops out at sf0.1, one decade above the bench warmup sf).
  *
  * Synthesizes a deterministic 10×-sf0.1 slice ("sf1ish") by structured
  * replication of the driver tables — shapes and distributions preserved,
  * content made copy-distinct so candidate-pair workloads scale linearly
  * instead of planting cross-copy duplicates:
  *
  *  - documents: per copy k, every word w → `w~k` (k>0). Doc lengths,
  *    word-frequency shape and WITHIN-copy near-dup structure replicate;
  *    shingles never collide across copies.
  *  - events: id/user shifted per copy, ts/type/value unchanged — same
  *    30-day window at 10× density (a busier system, not a longer one).
  *  - embeddings: id shifted, vectors deterministically jittered so the
  *    10 copies are near but not identical (no degenerate ANN ties).
  *  - lineitem/orders: orderkey block-shifted per copy — join fan-out
  *    exactly preserved.
  *  - dimension tables copied as-is (they are broadcast-scale by design).
  *
  * Then the configured queries (default: the top shufflers of the last
  * bench) run at sf0.01 → sf0.1 → sf1ish with per-query shuffle-byte
  * metering, and each decade's growth ratio is compared against its row
  * ratio. Output: `GROWTH_SPAN.json` in the repo root.
  */
object GrowthSpan {

  private val DefaultQueries = Seq(
    "b1_bucketed_join", "c8_expiry_plan", "t32_bpe_encode",
    "p1_corpus_ingest", "d4_ngram_jaccard", "t23_learned_quality",
    "t26_paragraph_dedup", "t10_self_repetition", "q42_quality_checks",
    "t29_keywords", "d6_dup_spans", "d2_minhash_lsh", "d9_incremental_dedup",
    "g2_frame_normalize", "st1_stream_windows")

  private val Copies = 10

  private final class Meter extends SparkListener {
    private val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
    }
    def mark(): Long = bytes.getAndSet(0L)
  }

  /** Replicate one source table `copies`× with copy-distinct keys. */
  private def scaled(spark: SparkSession, src: String, name: String): DataFrame = {
    val base = spark.read.parquet(s"$src/$name.parquet")
    val copies = (0 until Copies).map(k => base.withColumn("copy_k", lit(k)))
      .reduce(_ unionByName _)
    name match {
      case "documents" =>
        // word → word~k rewrite keeps length/frequency shape, kills
        // cross-copy shingle collisions; ids block-shifted
        copies
          .withColumn("doc_id", col("doc_id") + col("copy_k") * lit(1_000_000_000L))
          .withColumn("text",
            when(col("copy_k") === 0, col("text")).otherwise(
              array_join(transform(split(col("text"), " "),
                w => concat(w, lit("~"), col("copy_k"))), " ")))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .drop("copy_k")
      case "events" =>
        copies
          .withColumn("event_id", col("event_id") + col("copy_k") * lit(1_000_000_000_000L))
          .withColumn("user_id", col("user_id") + col("copy_k") * lit(1_000_000_000L))
          .drop("copy_k")
      case "embeddings" =>
        // deterministic per-(id, copy, dim) jitter ~ ±5e-2
        copies
          .withColumn("vec_id", col("vec_id") + col("copy_k") * lit(1_000_000_000L))
          .withColumn("embedding",
            when(col("copy_k") === 0, col("embedding")).otherwise(
              zip_with(col("embedding"),
                transform(sequence(lit(0), size(col("embedding")) - 1),
                  i => pmod(xxhash64(col("vec_id"), col("copy_k"), i), lit(1000L))),
                (v, h) => v + (h - lit(500L)).cast("float") / lit(10000.0f))))
          .drop("copy_k")
      case "lineitem" =>
        copies
          .withColumn("l_orderkey", col("l_orderkey") + col("copy_k") * lit(1_000_000_000L))
          .drop("copy_k")
      case "orders" =>
        copies
          .withColumn("o_orderkey", col("o_orderkey") + col("copy_k") * lit(1_000_000_000L))
          .withColumn("o_custkey", col("o_custkey")) // dims stay unscaled
          .drop("copy_k")
      case _ => base // dimension tables: single copy
    }
  }

  private def ensureSf1ish(spark: SparkSession, sf01: String, out: String): Unit = {
    val done = new java.io.File(s"$out/_GRAFT_SF1ISH_OK")
    if (done.exists()) return
    graft.core.Tables.all.foreach { t =>
      val df = scaled(spark, sf01, t)
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
  }

  private def rows(spark: SparkSession, d: String): Long =
    graft.core.Tables.all.map(t =>
      spark.read.parquet(s"$d/$t.parquet").count()).sum

  def main(args: Array[String]): Unit = {
    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1ish")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val repoRoot = sys.env.getOrElse("GRAFT_REPO_ROOT",
      sys.props.getOrElse("user.dir", "."))
    val names = sys.env.get("SPARK_GRAFT_SPAN_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)

    val spark = graft.core.GraftSession.local(cpus, "graft-growth-span")
    ensureSf1ish(spark, sf01, sf1)

    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    val dirs = Seq("sf0.01" -> sf001, "sf0.1" -> sf01, "sf1ish" -> sf1)
    val rowCounts = dirs.map { case (tag, d) => tag -> rows(spark, d) }.toMap

    val queries = graft.SparkEntry.queries
    val results = names.filter(queries.contains).map { name =>
      val fn = queries(name)
      val sh = dirs.map { case (tag, d) =>
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        meter.mark()
        val ok =
          try { fn(spark, d).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[span] $name failed on $tag: ${e.getMessage}")
            false
          }
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        val b = meter.mark()
        tag -> (if (ok) b else -1L)
      }.toMap
      // clear any memoized working sets between corpora
      spark.sharedState.cacheManager.clearCache()
      (name, sh)
    }

    def f(v: Double): String = "%.3f".format(v)
    val r1 = rowCounts("sf0.1").toDouble / rowCounts("sf0.01")
    val r2 = rowCounts("sf1ish").toDouble / rowCounts("sf0.1")
    val MinBytes = 64L * 1024
    val entries = results.map { case (name, sh) =>
      def ratio(a: String, b: String): Option[Double] = {
        val (x, y) = (sh(a), sh(b))
        if (x >= MinBytes && y >= 0) Some(y.toDouble / x) else None
      }
      val g1 = ratio("sf0.01", "sf0.1")
      val g2 = ratio("sf0.1", "sf1ish")
      val flag1 = g1.exists(_ > 1.5 * r1)
      val flag2 = g2.exists(_ > 1.5 * r2)
      s""""$name":{"mb":{"sf0.01":${f(sh("sf0.01") / 1048576.0)},"sf0.1":${f(
        sh("sf0.1") / 1048576.0)},"sf1ish":${f(sh("sf1ish") / 1048576.0)}},""" +
        s""""decade1":${g1.map(f).getOrElse("null")},"decade2":${g2.map(f)
          .getOrElse("null")},"flagged":${flag1 || flag2}}"""
    }
    val flagged = results.zip(entries).collect {
      case ((name, _), e) if e.contains("\"flagged\":true") => "\"" + name + "\""
    }
    val json =
      s"""{"row_ratio_decade1":${f(r1)},"row_ratio_decade2":${f(r2)},""" +
        s""""rows":{${rowCounts.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
        s""""flagged":${flagged.mkString("[", ",", "]")},""" +
        s""""queries":{${entries.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(repoRoot, "GROWTH_SPAN.json"), json + "\n")
    spark.stop()
  }
}
