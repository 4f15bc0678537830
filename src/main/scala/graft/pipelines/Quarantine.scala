package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Poison-pill quarantine for file-batch pipelines (shared by
  * [[HyperspectralPipeline]] and [[SpatiotemporalPipeline]]).
  *
  * Without it, a file whose parse fails kills the micro-batch, the batch
  * never commits, and a restart re-reads the SAME file — an infinite
  * crash loop (the exactly-once gate only advances past a file when its
  * batch succeeds). The reference's per-file task model degrades
  * differently: one funcX task dies, the service survives
  * (/root/reference/examples/hyperspectral_flow/main.py's per-file tool
  * dispatch). This helper re-expresses that for the batched stream.
  *
  * Cost model: ZERO on the happy path — the per-file probe only runs
  * after a batch has already failed, and a micro-batch carries at most a
  * file-arrival cadence of files, so the driver-side loop is bounded by
  * the watch cadence, not the data volume.
  */
object Quarantine {

  /** Run `analyze(files)`; on failure bisect per file with `parse` as the
    * probe, write data-borne failures to `qDir` as (path, error,
    * batch_id) rows (idempotent batch_id partition overwrite — the same
    * at-least-once replay shape as the analysis sinks), and re-run
    * `analyze` on the survivors. A failure NO per-file probe explains is
    * an infrastructure error: rethrown, keeping fail-fast where retrying
    * is the correct response.
    */
  def run(spark: SparkSession, files: DataFrame,
      parse: DataFrame => DataFrame, qDir: String, batchId: Long)(
      analyze: DataFrame => Unit): Unit =
    try analyze(files)
    catch { case first: Exception =>
      // task failures arrive wrapped (SparkException → cause chain); the
      // quarantine record carries the ROOT message — the decoder's
      // refuse-by-name text, not the scheduler's wrapper
      def rootMsg(e: Throwable): String = {
        var c: Throwable = e
        while (c.getCause != null && (c.getCause ne c)) c = c.getCause
        Option(c.getMessage).getOrElse(c.getClass.getName)
      }
      // the probe forces FULL evaluation of the parsed frame (noop sink —
      // a count() would let column pruning skip the failing expression)
      val paths = files.select("path").collect().map(_.getString(0))
      val verdicts: Seq[(String, Option[String])] = paths.toSeq.map { p =>
        val one = files.filter(col("path") === p)
        val err =
          try { parse(one).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Exception => Some(rootMsg(e)) }
        (p, err)
      }
      val bad = verdicts.collect { case (p, Some(err)) => (p, err) }
      if (bad.isEmpty) throw first
      import spark.implicits._
      bad.toDF("path", "error")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(qDir)
      val badSet = bad.map(_._1).toSet
      val good = files.filter(!col("path").isin(badSet.toSeq: _*))
      if (!good.isEmpty) analyze(good)
    }
}
