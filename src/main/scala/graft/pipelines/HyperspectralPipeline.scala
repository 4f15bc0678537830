package graft.pipelines

import graft.catalog.Catalog
import graft.signals.Signals
import graft.stream.FileWatcher
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's production pipeline, end to end (SURVEY §3.1,
  * /root/reference/examples/hyperspectral_flow/main.py): watch a directory,
  * per new file run the hyperspectral analysis, write sidecar artifacts,
  * and publish a checksummed DataCite document to the catalog. Five network
  * hops (watch → Transfer → funcX tool → Publish → Search) collapse into
  * one Structured Streaming job with intra-cluster shuffles.
  *
  * The EMD→signal-rows parse is pluggable (`parse`): tests inject a fixture
  * parser (FIXTURES F1); a production deployment plugs a jHDF-based one.
  * Everything downstream — reductions, normalization, catalog — is the real
  * engine.
  */
object HyperspectralPipeline {

  /** Per-batch analysis: signals → spectrum + intensity map + metadata,
    * written as parquet next to `outDir`, then catalog publish.
    * Runs inside `foreachBatch`, so each stage is a normal batch plan with
    * full Catalyst optimization.
    *
    * The 3-D signal is selected PER experiment (hs.load is per file,
    * hyperspectral.py:51-66) — a batch can carry many files (startup
    * backlog with no maxFilesPerTrigger), and a global first-match would
    * analyze one file while checkpointing all of them as seen.
    *
    * Side outputs are idempotent under foreachBatch's at-least-once
    * replay: each write lands in a `batch_id=<id>` partition with dynamic
    * partition overwrite, so a replayed batch replaces its own partition
    * instead of appending duplicates (Catalog.publish is already
    * idempotent by content key).
    */
  def analyzeBatch(spark: SparkSession, signals: DataFrame, files: DataFrame,
      outDir: String, catalogPath: String, batchId: Long = 0L): Unit = {
    def sink(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)

    val cube = Signals.explodeCube(Signals.firstWithNdimPerExperiment(signals, 3))
    sink(Signals.spectrum(cube), s"$outDir/spectrum")
    val intensity = Signals.intensityMap(cube)
    sink(intensity, s"$outDir/intensity")
    sink(Signals.metadataSummary(signals), s"$outDir/metadata")
    // sidecar image artifact (hyperspectral.py:106-107): idempotent by name
    graft.sinks.Artifacts.writeFiles(
      graft.sinks.Artifacts.intensityPngs(intensity), s"$outDir/artifacts")

    val docs = Catalog.dataciteDoc(
      files.select(col("path"), col("content"),
        lit("{}").as("metadata_json")))
    Catalog.publish(spark, docs, catalogPath)
  }

  /** Start the streaming pipeline. `parse(files)` maps raw file rows
    * (path, content, experiment_id) to signal rows (FIXTURES F1 schema).
    *
    * Poison-pill handling: without `quarantineDir` a file whose parse
    * fails kills the batch, the batch never commits, and a restart
    * re-reads the SAME file — an infinite crash loop (the exactly-once
    * gate only advances past a file when its batch succeeds). With
    * `quarantineDir` set, a failed batch is bisected per file on the
    * driver (zero cost on the happy path — the probe only runs after a
    * failure, and a micro-batch carries at most a file-arrival cadence of
    * files): data-borne failures land in `quarantineDir` as
    * (path, error, batch_id) rows with the same idempotent
    * partition-overwrite shape as the analysis sinks, the surviving files
    * are analyzed normally, and the batch COMMITS — one corrupt upload
    * costs one batch retry instead of the pipeline. A failure the bisect
    * cannot attribute to any file (every per-file probe succeeds — an
    * infrastructure error, not a data error) rethrows, keeping fail-fast
    * for the cases where retrying is correct. This is the reference's
    * per-file task-failure model (one funcX task dies, the service
    * survives) re-expressed for the batched stream.
    */
  def start(spark: SparkSession, watchDir: String, outDir: String,
      catalogPath: String, checkpoint: String,
      parse: DataFrame => DataFrame, drain: Boolean = false,
      quarantineDir: Option[String] = None): StreamingQuery = {
    val events = FileWatcher.fileEvents(spark, watchDir)
    FileWatcher.start(events, checkpoint, drain) { (batch, batchId) =>
      if (!batch.isEmpty) {
        val files = batch.select("path", "content", "experiment_id").cache()
        try {
          quarantineDir match {
            case None =>
              analyzeBatch(spark, parse(files), files, outDir, catalogPath, batchId)
            case Some(qDir) =>
              try analyzeBatch(spark, parse(files), files, outDir, catalogPath, batchId)
              catch { case first: Exception =>
                analyzeQuarantining(spark, files, parse, outDir, catalogPath,
                  qDir, batchId, first)
              }
          }
        } finally files.unpersist()
      }
    }
  }

  /** Bisect a failed batch per file; see [[start]]. The probe forces FULL
    * evaluation of the parsed frame (noop sink — a count() would let
    * column pruning skip the very expression that failed).
    */
  private def analyzeQuarantining(spark: SparkSession, files: DataFrame,
      parse: DataFrame => DataFrame, outDir: String, catalogPath: String,
      qDir: String, batchId: Long, first: Exception): Unit = {
    // task failures arrive wrapped (SparkException → cause chain); the
    // quarantine record carries the ROOT message — the decoder's
    // refuse-by-name text, not the scheduler's wrapper
    def rootMsg(e: Throwable): String = {
      var c: Throwable = e
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      Option(c.getMessage).getOrElse(c.getClass.getName)
    }
    val paths = files.select("path").collect().map(_.getString(0))
    val verdicts: Seq[(String, Option[String])] = paths.toSeq.map { p =>
      val one = files.filter(col("path") === p)
      val err =
        try { parse(one).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Exception => Some(rootMsg(e)) }
      (p, err)
    }
    val bad = verdicts.collect { case (p, Some(err)) => (p, err) }
    // nothing data-borne: the original failure was infrastructure — let
    // the stream fail fast so the retry that IS correct happens
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
    if (!good.isEmpty)
      analyzeBatch(spark, parse(good), good, outDir, catalogPath, batchId)
  }
}
