package graft.multimodal

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal pipeline query: each document becomes one
  * REAL grayscale PNG and one REAL MJPEG-AVI clip (encoded with the same
  * JDK codecs the sinks use, geometry derived from doc_id), then the full
  * decode → resize → frame-sample → feature pipeline runs over the encoded
  * bytes — batched mapPartitions, real javax.imageio / AVI-container
  * decode. The output columns are the pipeline's observed shapes, which
  * DuckDB recomputes arithmetically: the oracle validates schemas, decode
  * geometry, fan-out counts and batch plumbing end-to-end; pixel VALUES
  * are pinned separately by MultimodalSpec (lossless PNG round-trip).
  */
object MultimodalQueries {

  /** Deterministic grayscale pixels derived from content bytes. */
  private def synthPixels(bytes: Array[Byte], n: Int, salt: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    val len = math.max(bytes.length, 1)
    var i = 0
    while (i < n) {
      val b = if (bytes.isEmpty) 0 else bytes(i % len) & 0xFF
      out(i) = ((b ^ (i * 31 + salt)) & 0xFF).toByte
      i += 1
    }
    out
  }

  val m1Pipeline: QueryDef = QueryDef(
    "m1_multimodal_pipeline",
    (s, dir) => {
      val session = s
      import session.implicits._
      val docs = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]

      // ENCODE stage — real codec output, not synthetic buffers: one
      // grayscale PNG and one MJPEG-AVI per doc. The decode stages below
      // then exercise the real image/container codecs over these bytes.
      val imgMedia = docs.map { case (id, text, _) =>
        val w = (id % 5 + 2).toInt
        val h = (id % 3 + 2).toInt
        Media(id, "image",
          graft.sinks.Artifacts.grayPng(w, h, synthPixels(text.getBytes("UTF-8"), w * h, 0)),
          MediaMeta(w, h, 1, 0, 0, "png"))
      }
      val vidMedia = docs.map { case (id, text, nChars) =>
        val w = (id % 5 + 2).toInt
        val h = (id % 3 + 2).toInt
        val frames = (nChars % 7 + 1).toInt
        val bytes = text.getBytes("UTF-8")
        val jpegs = Seq.tabulate(frames)(f =>
          graft.sinks.Artifacts.grayJpeg(w, h, synthPixels(bytes, w * h, f + 1)))
        Media(id, "video", graft.sinks.Artifacts.mjpegAvi(jpegs, w, h),
          MediaMeta(w, h, 1, 0, frames, "avi"))
      }

      val decoded = Multimodal.decodeImages(imgMedia)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_pixels")
      val resized = Multimodal.resize(Multimodal.decodeImages(imgMedia), 3, 2)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_resized")
      val sampled = Multimodal.sampleFrames(vidMedia, everyN = 2)
        .groupByKey(_.media_id).count().toDF("doc_id", "n_sampled")
      val feats = Multimodal.extractFeatures(vidMedia, dim = 16)
        .map(f => (f.media_id, f.features.length)).toDF("doc_id", "feat_dim")

      decoded.join(resized, "doc_id").join(sampled, "doc_id").join(feats, "doc_id")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST((doc_id % 5 + 2) * (doc_id % 3 + 2) AS INTEGER) AS n_pixels,
        CAST(3 * 2 AS INTEGER) AS n_resized,
        CAST((n_chars % 7) // 2 + 1 AS BIGINT) AS n_sampled,
        CAST(16 AS INTEGER) AS feat_dim
      FROM documents ORDER BY doc_id""")
  )

  val all: Seq[QueryDef] = Seq(m1Pipeline)
}
