package graft.pipelines

import graft.catalog.Catalog
import graft.multimodal.{Media, MediaMeta, Multimodal}
import graft.signals.Signals
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's second production pipeline (SURVEY §3.1 variant,
  * /root/reference/examples/spatiotemporal_flow/main.py +
  * picoprobe/tools/temporal.py): watch → per new video file, normalize each
  * frame to uint8 (C12+E4), run ML inference over sampled frames (the YOLO
  * stage, kept pluggable per SURVEY §2 H — here the deterministic
  * batched-feature stub), write artifacts, publish to the catalog.
  */
object SpatiotemporalPipeline {

  /** Per-batch analysis over video signals ((T,X,Y) cubes in F1 layout).
    * Signal selection is per experiment and side outputs are idempotent
    * batch_id-partition overwrites — see HyperspectralPipeline.analyzeBatch
    * for the rationale (multi-file batches; at-least-once replay).
    */
  def analyzeBatch(spark: SparkSession, signals: DataFrame, files: DataFrame,
      outDir: String, catalogPath: String,
      infer: Dataset[Media] => DataFrame, batchId: Long = 0L): Unit = {
    def sink(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)

    val video = Signals.explodeVideo(Signals.firstWithNdimPerExperiment(signals, 3))
    val framesU8 = Signals.normalizeFrames(video)
    sink(framesU8, s"$outDir/frames_u8")
    // sidecar video artifact (temporal.py:26-35): idempotent by name
    graft.sinks.Artifacts.writeFiles(
      graft.sinks.Artifacts.videoArtifacts(framesU8), s"$outDir/artifacts")

    val session = spark
    import session.implicits._
    val media = files.select(col("experiment_id"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (eid, bytes) =>
        Media(eid.hashCode.toLong & 0x7FFFFFFFL, "video", bytes,
          MediaMeta(width = 4, height = 4, channels = 1, sampleRate = 0,
            nFrames = 8, format = "emd"))
      }
    sink(infer(media), s"$outDir/detections")

    Catalog.publish(spark,
      Catalog.dataciteDoc(files.select(col("path"), col("content"),
        lit("{}").as("metadata_json"))),
      catalogPath)
  }

  /** Default inference stage: the batched feature extractor (stub model,
    * real mapPartitions batch shape — swap for an ONNX session per
    * partition in production).
    */
  def defaultInfer(media: Dataset[Media]): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    Multimodal.extractFeatures(media, dim = 16)
      .map(f => (f.media_id, f.features.length, f.features.sum))
      .toDF("media_id", "dim", "score")
  }

  def start(spark: SparkSession, watchDir: String, outDir: String,
      catalogPath: String, checkpoint: String,
      parse: DataFrame => DataFrame, drain: Boolean = false): StreamingQuery = {
    val events = graft.stream.FileWatcher.fileEvents(spark, watchDir)
    graft.stream.FileWatcher.start(events, checkpoint, drain) { (batch, batchId) =>
      if (!batch.isEmpty) {
        val files = batch.select("path", "content", "experiment_id").cache()
        try analyzeBatch(spark, parse(files), files, outDir, catalogPath,
          defaultInfer, batchId)
        finally files.unpersist()
      }
    }
  }
}
