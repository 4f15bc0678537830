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
    */
  def analyzeBatch(spark: SparkSession, signals: DataFrame, files: DataFrame,
      outDir: String, catalogPath: String): Unit = {
    val cube = Signals.explodeCube(Signals.firstWithNdim(signals, 3))
    Signals.spectrum(cube)
      .write.mode("append").parquet(s"$outDir/spectrum")
    Signals.intensityMap(cube)
      .write.mode("append").parquet(s"$outDir/intensity")
    Signals.metadataSummary(signals)
      .write.mode("append").parquet(s"$outDir/metadata")

    val docs = Catalog.dataciteDoc(
      files.select(col("path"), col("content"),
        lit("{}").as("metadata_json")))
    Catalog.publish(spark, docs, catalogPath)
  }

  /** Start the streaming pipeline. `parse(files)` maps raw file rows
    * (path, content, experiment_id) to signal rows (FIXTURES F1 schema).
    */
  def start(spark: SparkSession, watchDir: String, outDir: String,
      catalogPath: String, checkpoint: String,
      parse: DataFrame => DataFrame, drain: Boolean = false): StreamingQuery = {
    val events = FileWatcher.fileEvents(spark, watchDir)
    FileWatcher.start(events, checkpoint, drain) { (batch, _) =>
      if (!batch.isEmpty) {
        val files = batch.select("path", "content", "experiment_id").cache()
        try analyzeBatch(spark, parse(files), files, outDir, catalogPath)
        finally files.unpersist()
      }
    }
  }
}
