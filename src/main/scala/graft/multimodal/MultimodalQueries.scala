package graft.multimodal

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal pipeline query: documents become media rows
  * (text bytes as opaque content, per-doc geometry derived from doc_id),
  * then the REAL decode → resize → frame-sample → feature pipeline runs
  * (batched mapPartitions, stub codec), and the output columns are the
  * pipeline's observed shapes — which DuckDB recomputes arithmetically.
  * The oracle therefore validates the plumbing (schemas, fan-out counts,
  * batch geometry) end-to-end even though the codec is a stub.
  */
object MultimodalQueries {

  val m1Pipeline: QueryDef = QueryDef(
    "m1_multimodal_pipeline",
    (s, dir) => {
      val session = s
      import session.implicits._
      val media = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .map { case (id, text, nChars) =>
          val w = (id % 5 + 2).toInt
          val h = (id % 3 + 2).toInt
          val frames = (nChars % 7 + 1).toInt
          Media(id, "video", text.getBytes("UTF-8"), MediaMeta(w, h, 2, 0, frames, "raw"))
        }

      val decoded = Multimodal.decodeImages(media)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_pixels")
      val resized = Multimodal.resize(Multimodal.decodeImages(media), 3, 2)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_resized")
      val sampled = Multimodal.sampleFrames(media, everyN = 2)
        .groupByKey(_.media_id).count().toDF("doc_id", "n_sampled")
      val feats = Multimodal.extractFeatures(media, dim = 16)
        .map(f => (f.media_id, f.features.length)).toDF("doc_id", "feat_dim")

      decoded.join(resized, "doc_id").join(sampled, "doc_id").join(feats, "doc_id")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST((doc_id % 5 + 2) * (doc_id % 3 + 2) * 2 AS INTEGER) AS n_pixels,
        CAST(3 * 2 * 2 AS INTEGER) AS n_resized,
        CAST((n_chars % 7) // 2 + 1 AS BIGINT) AS n_sampled,
        CAST(16 AS INTEGER) AS feat_dim
      FROM documents ORDER BY doc_id""")
  )

  val all: Seq[QueryDef] = Seq(m1Pipeline)
}
