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

      // each media dataset feeds TWO operator branches; in production the
      // media column is a parquet scan each branch re-reads cheaply, but
      // here the bytes are synthesized (encode stands in for the scan) —
      // cache them once so the branches exercise the DECODE ops, not the
      // fixture encoder (the d2-LSH working-set precedent)
      val img = imgMedia.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vid = vidMedia.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val decoded = Multimodal.decodeImages(img)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_pixels")
      val resized = Multimodal.resize(Multimodal.decodeImages(img), 3, 2)
        .map(d => (d.media_id, d.pixels.length)).toDF("doc_id", "n_resized")
      val sampled = Multimodal.sampleFrames(vid, everyN = 2)
        .groupByKey(_.media_id).count().toDF("doc_id", "n_sampled")
      val feats = Multimodal.extractFeatures(vid, dim = 16)
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

  /** Media fixture for m2: one grayscale PNG per doc, ≥3×3 so the conv
    * interior is non-empty, pixels deterministic from the text bytes.
    */
  private def m2Media(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val session = s
    import session.implicits._
    Tables.loadSpread(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val w = (id % 6 + 3).toInt
        val h = (id % 4 + 3).toInt
        Media(id, "image",
          graft.sinks.Artifacts.grayPng(w, h, synthPixels(text.getBytes("UTF-8"), w * h, 9)),
          MediaMeta(w, h, 1, 0, 0, "png"))
      }
  }

  /** The inference stage under an EXACT oracle: encode → decode →
    * session-per-partition batched inference with [[IntConvModel]], whose
    * scores are integer conv responses — and DuckDB recomputes the same
    * 3×3 convolutions RELATIONALLY (9-way neighbor self-join over the
    * aux-dumped decoded pixels), so decode fidelity, batching, positional
    * zip and the conv arithmetic are all value-verified with no float
    * tolerance. The normalized [[ConvPoolModel]] shares the kernel bank
    * and is pinned by InferenceSpec.
    */
  val m2InferenceConv: QueryDef = QueryDef(
    "m2_inference_conv",
    (s, dir) => {
      val session = s
      import session.implicits._
      Inference.infer(Multimodal.decodeImages(m2Media(s, dir)), () => new IntConvModel)
        .map(d => (d.media_id, d.scores(0).toLong, d.scores(1).toLong,
          d.scores(2).toLong, d.scores(3).toLong, d.scores(4).toLong))
        .toDF("doc_id", "s_identity", "s_sobel_x", "s_sobel_y", "s_laplace", "s_total")
        .orderBy("doc_id")
    },
    Some("""
      WITH p AS (SELECT * FROM read_parquet('{OUT}/aux/m2_inference_conv__pixels/*.parquet')),
      ctr AS (
        SELECT doc_id, w, pos FROM p
        WHERE pos % w BETWEEN 1 AND w - 2 AND pos // w BETWEEN 1 AND h - 2),
      conv AS (
        SELECT c.doc_id,
          n4.v AS ident,
          GREATEST(-n0.v + n2.v - 2*n3.v + 2*n5.v - n6.v + n8.v, 0) AS sx,
          GREATEST(-n0.v - 2*n1.v - n2.v + n6.v + 2*n7.v + n8.v, 0) AS sy,
          GREATEST(4*n4.v - n1.v - n3.v - n5.v - n7.v, 0) AS lap
        FROM ctr c
        JOIN p n0 ON n0.doc_id = c.doc_id AND n0.pos = c.pos - c.w - 1
        JOIN p n1 ON n1.doc_id = c.doc_id AND n1.pos = c.pos - c.w
        JOIN p n2 ON n2.doc_id = c.doc_id AND n2.pos = c.pos - c.w + 1
        JOIN p n3 ON n3.doc_id = c.doc_id AND n3.pos = c.pos - 1
        JOIN p n4 ON n4.doc_id = c.doc_id AND n4.pos = c.pos
        JOIN p n5 ON n5.doc_id = c.doc_id AND n5.pos = c.pos + 1
        JOIN p n6 ON n6.doc_id = c.doc_id AND n6.pos = c.pos + c.w - 1
        JOIN p n7 ON n7.doc_id = c.doc_id AND n7.pos = c.pos + c.w
        JOIN p n8 ON n8.doc_id = c.doc_id AND n8.pos = c.pos + c.w + 1),
      tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s_total FROM p GROUP BY doc_id)
      SELECT conv.doc_id,
             CAST(SUM(ident) AS BIGINT) AS s_identity,
             CAST(SUM(sx) AS BIGINT) AS s_sobel_x,
             CAST(SUM(sy) AS BIGINT) AS s_sobel_y,
             CAST(SUM(lap) AS BIGINT) AS s_laplace,
             tot.s_total
      FROM conv JOIN tot ON conv.doc_id = tot.doc_id
      GROUP BY conv.doc_id, tot.s_total
      ORDER BY conv.doc_id"""),
    aux = Map("pixels" -> ((s, dir) => {
      val session = s
      import session.implicits._
      // dump what the DECODE produced (not the encode input) — the oracle
      // then checks the decode round-trip too
      Multimodal.decodeImages(m2Media(s, dir))
        .flatMap(d => d.pixels.zipWithIndex.map { case (b, pos) =>
          (d.media_id, d.width, d.height, pos, b & 0xFF)
        })
        .toDF("doc_id", "w", "h", "pos", "v")
        .orderBy("doc_id", "pos")
    }))
  )

  /** The AUDIO modality under an exact integer oracle: per document a
    * real mono 16-bit PCM WAV is encoded (deterministic samples derived
    * from doc_id), the REAL RIFF/WAVE decoder parses it back, and
    * fixed-length framing computes integer features (energy = Σx²,
    * zero crossings). Every number is integer arithmetic over the
    * decoded samples, and the sample formula is pure doc_id math — so
    * DuckDB replays the whole thing (series fan-out + window lag) with
    * zero float tolerance, verifying encode→decode fidelity, framing
    * boundaries and the feature sums together. Batched mapPartitions
    * decode, per-row frame fan-out, one tiny groupBy — no shuffle beyond
    * the final per-doc aggregate.
    */
  val m3AudioFeatures: QueryDef = QueryDef(
    "m3_audio_features",
    (s, dir) => {
      val session = s
      import session.implicits._
      val media = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val n = (nChars % 50 + 20).toInt
          val samples = Array.tabulate(n)(i =>
            ((id * 7 + i.toLong * 13) % 65536 - 32768).toShort)
          Media(id, "audio", graft.sinks.Artifacts.pcmWav(8000, samples),
            MediaMeta(0, 0, 1, 8000, n, "wav"))
        }
      Multimodal.audioFrames(Multimodal.decodeAudio(media), frameLen = 16)
        .groupBy(col("media_id").as("doc_id"))
        .agg(sum(col("n")).as("n_samples"),
          count(lit(1)).as("n_frames"),
          sum(col("energy")).as("total_energy"),
          sum(col("crossings")).as("total_crossings"),
          max(col("energy")).as("max_frame_energy"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, CAST(n_chars % 50 + 20 AS BIGINT) AS n FROM documents),
      s AS (SELECT doc_id, i,
                   (doc_id * 7 + i * 13) % 65536 - 32768 AS v,
                   i // 16 AS f
            FROM (SELECT doc_id, n, UNNEST(GENERATE_SERIES(0, n - 1)) AS i FROM d)),
      s2 AS (SELECT doc_id, f, i, v,
                    LAG(v) OVER (PARTITION BY doc_id, f ORDER BY i) AS pv
             FROM s),
      fr AS (SELECT doc_id, f, COUNT(*) AS n,
                    CAST(SUM(v * v) AS BIGINT) AS energy,
                    CAST(SUM(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END) AS BIGINT)
                      AS crossings
             FROM s2 GROUP BY doc_id, f)
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_samples,
             COUNT(*) AS n_frames,
             CAST(SUM(energy) AS BIGINT) AS total_energy,
             CAST(SUM(crossings) AS BIGINT) AS total_crossings,
             CAST(MAX(energy) AS BIGINT) AS max_frame_energy
      FROM fr GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Perceptual image dedup — dHash (difference hash) over REAL decoded
    * pixels: each 9×7 grayscale image hashes to 56 bits (bit = right
    * neighbor brighter than left; 56 keeps every bit off the sign
    * position, which DuckDB's `<<` refuses), and visually-near images
    * land within a few Hamming bits. Each doc gets its PNG plus a
    * PLANTED near-variant (one corner pixel flipped — at most 1 bit can
    * change), and the query reports the orig/variant hash pair with its
    * Hamming distance: the multimodal analog of d3's SimHash text dedup.
    * Pixels run through the real encode→decode roundtrip (PNG is
    * lossless, pinned by m1), while the oracle replays the pixel
    * synthesis + comparison arithmetic relationally — bit_count(xor)
    * exact on both engines.
    */
  val m4ImagePhash: QueryDef = QueryDef(
    "m4_image_phash",
    (s, dir) => {
      val session = s
      import session.implicits._
      val W = 9; val H = 7
      val media = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val px = synthPixels(text.getBytes("UTF-8"), W * H, 3)
          val px2 = px.clone(); px2(0) = (px2(0) ^ 0x80).toByte // planted variant
          Seq(
            Media(id * 2, "image", graft.sinks.Artifacts.grayPng(W, H, px),
              MediaMeta(W, H, 1, 0, 0, "png")),
            Media(id * 2 + 1, "image", graft.sinks.Artifacts.grayPng(W, H, px2),
              MediaMeta(W, H, 1, 0, 0, "png")))
        }
      val hashes = Multimodal.decodeImages(media).map { d =>
        var h = 0L
        var y = 0
        while (y < d.height) {
          var x = 0
          while (x < d.width - 1) {
            val l = d.pixels(y * d.width + x) & 0xFF
            val r = d.pixels(y * d.width + x + 1) & 0xFF
            if (r > l) h |= 1L << (y * (d.width - 1) + x)
            x += 1
          }
          y += 1
        }
        (d.media_id / 2, d.media_id % 2, h)
      }.toDF("doc_id", "variant", "phash")
      hashes.groupBy("doc_id")
        .agg(max(when(col("variant") === 0, col("phash"))).as("h_orig"),
          max(when(col("variant") === 1, col("phash"))).as("h_variant"))
        .withColumn("hamming",
          bit_count(col("h_orig").bitwiseXOR(col("h_variant"))))
        .orderBy("doc_id")
    },
    Some("""
      WITH px AS (
        SELECT doc_id, v, i,
               CASE WHEN v = 1 AND i = 0
                    THEN xor(xor(UNICODE(SUBSTR(text, (i % LENGTH(text)) + 1, 1)),
                                 (i * 31 + 3) % 256) % 256, 128)
                    ELSE xor(UNICODE(SUBSTR(text, (i % LENGTH(text)) + 1, 1)),
                             (i * 31 + 3) % 256) % 256
               END AS p
        FROM documents,
             UNNEST(GENERATE_SERIES(0, 62)) AS t(i),
             UNNEST([0, 1]) AS vv(v)),
      bits AS (
        SELECT a.doc_id, a.v,
               CAST(SUM(CASE WHEN b.p > a.p
                        THEN (CAST(1 AS BIGINT) << ((a.i // 9) * 8 + (a.i % 9)))
                        ELSE 0 END) AS BIGINT) AS phash
        FROM px a JOIN px b
          ON b.doc_id = a.doc_id AND b.v = a.v AND b.i = a.i + 1
        WHERE a.i % 9 < 8
        GROUP BY a.doc_id, a.v)
      SELECT o.doc_id, o.phash AS h_orig, n.phash AS h_variant,
             bit_count(xor(o.phash, n.phash)) AS hamming
      FROM bits o JOIN bits n ON n.doc_id = o.doc_id
      WHERE o.v = 0 AND n.v = 1
      ORDER BY o.doc_id""")
  )

  /** Per-video frame-intensity sums through the FULL MP4 path: encode
    * real JPEG frames into the ISO-BMFF container ([[graft.sinks
    * .Artifacts.mjpegMp4]]), parse it back via the magic-dispatch
    * container walk, decode every frame, and sum raw uint8 intensities —
    * one integer per (video, frame). A scene CUT is planted at frame
    * n/2 by shifting the synthesis salt, so successive-frame deltas
    * spike there.
    */
  private def m5FrameSums(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val session = s
    import session.implicits._
    Tables.loadSpread(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val w = (id % 5 + 2).toInt
        val h = (id % 3 + 2).toInt
        val n = (id % 6 + 4).toInt
        val cut = n / 2
        val bytes = text.getBytes("UTF-8")
        val len = math.max(bytes.length, 1)
        // two SCENES: frames within a scene are near-identical (content
        // texture + a ±1 per-frame jitter), the cut jumps brightness by
        // 160 — intra-scene deltas are JPEG-noise-sized, the cut is not
        def frame(f: Int): Array[Byte] = Array.tabulate(w * h) { i =>
          val base = if (f >= cut) 160 else 0
          (base + (bytes(i % len) & 0x3F) + (f % 2)).toByte
        }
        val jpegs = Seq.tabulate(n)(f =>
          graft.sinks.Artifacts.grayJpeg(w, h, frame(f)))
        val video = Codec.parseVideo(graft.sinks.Artifacts.mjpegMp4(jpegs, w, h))
        (0 until video.frameCount).map { f =>
          val (_, _, _, px) = video.decodeFrame(f)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i) & 0xFF; i += 1 }
          (id, f, sum)
        }
      })
      .toDF("doc_id", "frame_idx", "psum")
  }

  /** Scene-change detection — the video-curation op that splits clips at
    * hard cuts before captioning/training: per video, successive-frame
    * intensity deltas, the maximum delta, and the (deterministic,
    * smallest-index) frame achieving it. The per-video window is bounded
    * by frames-per-clip, so partitioning by video scales; decoded sums
    * are integers, and the oracle replays delta/argmax exactly from the
    * aux-dumped frame table (the s2/s3 pattern: the analytic layer is
    * value-verified, the codec layer is spec-pinned).
    */
  val m5SceneCuts: QueryDef = QueryDef(
    "m5_scene_cuts",
    (s, dir) => {
      // one doc_id-keyed lineage end to end: the ordered window computes
      // deltas, the unbounded windows fold max/argmin/count over the same
      // partitioning, and the final collapse groups on the window key —
      // ONE exchange total and the frame decode runs exactly once (the
      // join formulation forked the decode lineage into three consumers)
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      m5FrameSums(s, dir)
        .withColumn("diff", abs(col("psum") - lag("psum", 1).over(wOrd)))
        .withColumn("max_diff", max(col("diff")).over(wDoc))
        .withColumn("n_frames", count(lit(1)).over(wDoc))
        .withColumn("cut_frame",
          min(when(col("diff") === col("max_diff"), col("frame_idx"))).over(wDoc))
        .groupBy("doc_id")
        .agg(max(col("n_frames")).as("n_frames"),
          max(col("cut_frame")).as("cut_frame"),
          max(col("max_diff")).as("max_diff"))
        .select("doc_id", "n_frames", "cut_frame", "max_diff")
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (SELECT * FROM read_parquet('{OUT}/aux/m5_scene_cuts__fsums/*.parquet')),
      d AS (
        SELECT doc_id, frame_idx, psum,
               ABS(psum - LAG(psum) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS diff
        FROM f),
      a AS (SELECT doc_id, MAX(diff) AS max_diff FROM d
            WHERE diff IS NOT NULL GROUP BY doc_id),
      nf AS (SELECT doc_id, COUNT(*) AS n_frames FROM d GROUP BY doc_id)
      SELECT d.doc_id, nf.n_frames, MIN(d.frame_idx) AS cut_frame, a.max_diff
      FROM d JOIN a ON d.doc_id = a.doc_id AND d.diff = a.max_diff
      JOIN nf ON nf.doc_id = d.doc_id
      GROUP BY d.doc_id, nf.n_frames, a.max_diff
      ORDER BY d.doc_id"""),
    aux = Map("fsums" -> ((s, dir) =>
      m5FrameSums(s, dir).orderBy("doc_id", "frame_idx")))
  )

  /** Energy-threshold voice-activity detection over the REAL WAV path:
    * deterministic PCM with a planted amplitude envelope (every third
    * 32-sample block is attenuated by an arithmetic >> 3 — the stand-in
    * for silence between utterances; harness audio is otherwise
    * stationary, the t15/d9 planted-data precedent) goes through the
    * byte-level WAV encode → decode → framing pipeline, frames classify
    * voiced by integer energy > 1e9, and adjacent voiced frames merge
    * into segments with the q21 gap-and-island discipline (lag + running
    * sum, window PARTITIONED BY media — parallel per clip at any scale).
    * Frames are 16 samples so every frame sits inside one envelope
    * block; all arithmetic is integer (>> 3 floors exactly like
    * DuckDB's //), so the oracle replays segmentation exactly.
    */
  val m6AudioVad: QueryDef = QueryDef(
    "m6_audio_vad",
    (s, dir) => {
      val session = s
      import session.implicits._
      val media = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val n = (nChars % 200 + 160).toInt
          val samples = Array.tabulate(n) { i =>
            val base = ((id * 7 + i.toLong * 13) % 65536 - 32768).toShort
            if ((i / 32) % 3 == 0) (base >> 3).toShort else base
          }
          Media(id, "audio", graft.sinks.Artifacts.pcmWav(8000, samples),
            MediaMeta(0, 0, 1, 8000, n, "wav"))
        }
      val frames = Multimodal
        .audioFrames(Multimodal.decodeAudio(media), frameLen = 16)
      val tot = frames.groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      val seg = frames.filter(col("energy") > 1000000000L)
        .withColumn("pv", lag("frame_idx", 1).over(w))
        .withColumn("new_seg",
          when(col("pv").isNull || col("frame_idx") - col("pv") > 1, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("new_seg")
          .over(w.rowsBetween(org.apache.spark.sql.expressions
            .Window.unboundedPreceding, 0)))
        .groupBy("media_id", "sid").agg(count(lit(1)).as("len"))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_segments"), max("len").as("max_seg_frames"),
          sum("len").as("voiced_frames"))
      tot.join(seg, Seq("media_id"), "left")
        .select(col("media_id").as("doc_id"), col("n_frames"),
          coalesce(col("voiced_frames"), lit(0L)).as("voiced_frames"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("max_seg_frames"), lit(0L)).as("max_seg_frames"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, CAST(n_chars % 200 + 160 AS BIGINT) AS n
                 FROM documents),
      s AS (SELECT doc_id, i,
              CASE WHEN (i // 32) % 3 = 0
                   THEN ((doc_id * 7 + i * 13) % 65536 - 32768) // 8
                   ELSE (doc_id * 7 + i * 13) % 65536 - 32768 END AS v,
              i // 16 AS f
            FROM (SELECT doc_id, n, UNNEST(GENERATE_SERIES(0, n - 1)) AS i
                  FROM d)),
      fr AS (SELECT doc_id, f, CAST(SUM(v * v) AS BIGINT) AS energy
             FROM s GROUP BY doc_id, f),
      tot AS (SELECT doc_id, COUNT(*) AS n_frames FROM fr GROUP BY doc_id),
      vo AS (SELECT doc_id, f FROM fr WHERE energy > 1000000000),
      seg AS (SELECT doc_id, f,
                SUM(CASE WHEN pv IS NULL OR f - pv > 1 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY f
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid
              FROM (SELECT doc_id, f,
                      LAG(f) OVER (PARTITION BY doc_id ORDER BY f) AS pv
                    FROM vo)),
      sg AS (SELECT doc_id, sid, COUNT(*) AS len FROM seg
             GROUP BY doc_id, sid),
      agg AS (SELECT doc_id, COUNT(*) AS n_segments,
                     MAX(len) AS max_seg_frames,
                     CAST(SUM(len) AS BIGINT) AS voiced_frames
              FROM sg GROUP BY doc_id)
      SELECT t.doc_id, t.n_frames,
             COALESCE(a.voiced_frames, 0) AS voiced_frames,
             COALESCE(a.n_segments, 0) AS n_segments,
             COALESCE(a.max_seg_frames, 0) AS max_seg_frames
      FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""")
  )

  /** KEYFRAME selection — the curation step after scene splitting: per
    * detected scene, the REPRESENTATIVE frame a captioning/training
    * pipeline keeps. Scenes come from m5's cut detection (argmax
    * successive-frame delta); the representative is the frame whose
    * intensity sits closest to its scene's mean, computed divisionless as
    * argmin |psum·cnt − tot| (all integers — exact on both engines) with
    * the smallest frame index breaking ties via lexicographic struct-min.
    * Every window and aggregate partitions by video (bounded by
    * frames-per-clip), so the op is embarrassingly parallel over clips at
    * any scale; the oracle replays cut → scene → argmin from the aux
    * frame dump.
    */
  val m7Keyframes: QueryDef = QueryDef(
    "m7_keyframes",
    (s, dir) => {
      // all windows and the final collapse share the doc_id hash
      // partitioning (scene refines doc_id, so the (doc_id, scene)
      // windows re-sort but never re-exchange): ONE shuffle, frame
      // decode runs exactly once — the join formulation re-decoded the
      // video for every join consumer
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val wScene = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id", "scene")
      m5FrameSums(s, dir)
        .withColumn("diff", abs(col("psum") - lag("psum", 1).over(wOrd)))
        .withColumn("max_diff", max(col("diff")).over(wDoc))
        .withColumn("cut_frame",
          min(when(col("diff") === col("max_diff"), col("frame_idx"))).over(wDoc))
        .withColumn("scene",
          when(col("frame_idx") >= col("cut_frame"), 1L).otherwise(0L))
        .withColumn("cnt", count(lit(1)).over(wScene))
        .withColumn("tot", sum(col("psum")).over(wScene))
        .withColumn("dev", abs(col("psum") * col("cnt") - col("tot")))
        .groupBy("doc_id", "scene")
        .agg(min(struct(col("dev"), col("frame_idx"))).as("m"),
          max(col("cnt")).as("n_frames"))
        .select(col("doc_id"), col("scene"),
          col("m.frame_idx").as("rep_frame"), col("m.dev").as("dev"),
          col("n_frames"))
        .orderBy("doc_id", "scene")
    },
    Some("""
      WITH f AS (SELECT * FROM read_parquet('{OUT}/aux/m7_keyframes__fsums/*.parquet')),
      d AS (
        SELECT doc_id, frame_idx, psum,
               ABS(psum - LAG(psum) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS diff
        FROM f),
      a AS (SELECT doc_id, MAX(diff) AS max_diff FROM d
            WHERE diff IS NOT NULL GROUP BY doc_id),
      c AS (SELECT d.doc_id, MIN(frame_idx) AS cut_frame
            FROM d JOIN a ON d.doc_id = a.doc_id AND d.diff = a.max_diff
            GROUP BY d.doc_id),
      sc AS (SELECT d.doc_id, frame_idx, psum,
                    CASE WHEN frame_idx >= cut_frame THEN 1 ELSE 0 END AS scene
             FROM d JOIN c ON d.doc_id = c.doc_id),
      st AS (SELECT doc_id, scene, COUNT(*) AS cnt,
                    CAST(SUM(psum) AS BIGINT) AS tot
             FROM sc GROUP BY doc_id, scene),
      dev AS (
        SELECT sc.doc_id, sc.scene, frame_idx,
               CAST(ABS(psum * cnt - tot) AS BIGINT) AS dev, cnt,
               ROW_NUMBER() OVER (PARTITION BY sc.doc_id, sc.scene
                                  ORDER BY ABS(psum * cnt - tot), frame_idx) AS rn
        FROM sc JOIN st ON st.doc_id = sc.doc_id AND st.scene = sc.scene)
      SELECT doc_id, CAST(scene AS BIGINT) AS scene, frame_idx AS rep_frame,
             dev, cnt AS n_frames
      FROM dev WHERE rn = 1 ORDER BY doc_id, scene"""),
    aux = Map("fsums" -> ((s, dir) =>
      m5FrameSums(s, dir).orderBy("doc_id", "frame_idx")))
  )

  // ---------------------------------------------------------------- m8
  /** m8 clip geometry: (width, height, frames) from doc_id. 4:2:0 needs
    * even dims; w ∈ {4,6,8}, h ∈ {4,6}, n ∈ 2..5. */
  private def m8Geom(id: Long): (Int, Int, Int) =
    (((id % 3) * 2 + 4).toInt, ((id % 2) * 2 + 4).toInt, (id % 4 + 2).toInt)

  /** m8 source frame f — pure doc_id arithmetic (the DuckDB oracle
    * replays exactly this formula). */
  private def m8Frame(id: Long, w: Int, h: Int, f: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((id * 7 + f * 31 + i * 13) % 256).toByte)

  /** One-time-per-JVM fixture store for m8: each doc's TWO real 'avc1'
    * MP4s (I_PCM lossless + IPPP CAVLC at qp 30), synthesized once and
    * parqueted to a temp dir, keyed by sf dir. In production the media
    * column IS a parquet scan; here the encoder stands in for the
    * upstream writer, and encoding per timed pass made the bench time
    * fixture synthesis instead of the ingest/decode operator under test
    * (and its GC pressure bled into bench neighbors). Encode-once is the
    * m1/b1 precedent; Bench discloses it via the `amortized` field.
    */
  private val m8MediaCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureM8Media(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    m8MediaCache.computeIfAbsent(
      Tables.corpusCacheKey(s, dir, "documents"), _ => {
      val session = s
      import session.implicits._
      import graft.multimodal.h264.H264Encoder
      val path =
        java.nio.file.Files.createTempDirectory("graft-m8").toString + "/media"
      Tables.loadSpread(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h, n) = m8Geom(id)
          val frames = Seq.tabulate(n)(m8Frame(id, w, h, _))
          val pcm = graft.sinks.Artifacts.avcMp4(H264Encoder.encodeGray(
            frames, w, h, H264Encoder.Config(qp = 28, pcmEvery = 1)))
          val lossy = graft.sinks.Artifacts.avcMp4(H264Encoder.encodeGray(
            frames, w, h, H264Encoder.Config(qp = 30, pFrames = true)))
          (id, pcm, lossy)
        })
        .toDF("doc_id", "pcm", "lossy")
        .write.mode("overwrite").parquet(path)
      path
    })

  /** The H.264 ingest path as a first-class, value-verified operator:
    * every document's clip is a real 'avc1' MP4 — SPS/PPS in avcC, AVCC
    * samples, the layout ffmpeg/imageio-style writers produce for the
    * reference's temporal.py clips — decoded by the pure-JVM
    * H.264 decoder ([[graft.multimodal.h264.H264Decoder]]).
    * Two bitstreams per doc: an I_PCM stream (lossless by construction,
    * so DuckDB replays the decoded luma sums EXACTLY from the synthesis
    * formula — container walk, avcC parse, NAL/slice/MB decode and the
    * YCbCr plumbing all value-verified end to end) and a CAVLC/inter
    * stream at qp 30 whose decoded error must sit inside the quantizer
    * envelope (a genuine lossy decode per row, boolean-pinned; the
    * codec's numeric layer is spec-pinned by H264Spec/Mp4AvcSpec).
    * The MP4 bytes come from the encode-once fixture store above, so
    * the timed path is what the operator IS at scale: a parquet media
    * scan → container walk → decode, pure per-row fan-out in batched
    * mapPartitions — no shuffle before the final sort, embarrassingly
    * parallel over clips.
    */
  val m8H264Video: QueryDef = QueryDef(
    "m8_h264_video",
    (s, dir) => {
      val session = s
      import session.implicits._
      s.read.parquet(ensureM8Media(s, dir))
        .as[(Long, Array[Byte], Array[Byte])]
        .mapPartitions(_.map { case (id, pcm, lossy) =>
          val (w, h, n) = m8Geom(id)

          // lossless path: I_PCM macroblocks
          val video = Codec.parseVideo(pcm)
          var total = 0L
          var maxFrame = Long.MinValue
          var chromaFlat = true
          (0 until video.frameCount).foreach { f =>
            val (dw, dh, _, px) = video.decodeFrame(f)
            var sum = 0L
            var i = 0
            while (i < dw * dh) {
              sum += px(i * 3) & 0xFF
              if ((px(i * 3 + 1) & 0xFF) != 128 ||
                (px(i * 3 + 2) & 0xFF) != 128) chromaFlat = false
              i += 1
            }
            total += sum
            if (sum > maxFrame) maxFrame = sum
          }

          // lossy path: IPPP at qp 30 — P_Skip / motion compensation /
          // inter CAVLC run through the real session decode, error
          // bounded by the quantizer envelope (4·2^(qp/6) = 128); the
          // source frame is re-derived from the id formula (cheap
          // arithmetic, not part of the fixture store)
          val lv = Codec.parseVideo(lossy)
          var maxErr = 0
          (0 until lv.frameCount).foreach { f =>
            val (dw, dh, _, px) = lv.decodeFrame(f)
            val src = m8Frame(id, w, h, f)
            var i = 0
            while (i < dw * dh) {
              maxErr = math.max(maxErr,
                math.abs((px(i * 3) & 0xFF) - (src(i) & 0xFF)))
              i += 1
            }
          }
          (id, video.frameCount.toLong, total, maxFrame, chromaFlat,
            maxErr <= 128 && n == video.frameCount)
        })
        .toDF("doc_id", "n_frames", "luma_total", "max_frame_sum",
          "chroma_flat", "lossy_in_envelope")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, CAST((doc_id % 3) * 2 + 4 AS BIGINT) AS w,
                        CAST((doc_id % 2) * 2 + 4 AS BIGINT) AS h,
                        CAST(doc_id % 4 + 2 AS BIGINT) AS n
                 FROM documents),
      fr AS (SELECT doc_id, w, h, UNNEST(GENERATE_SERIES(0, n - 1)) AS f FROM d),
      px0 AS (SELECT doc_id, f, UNNEST(GENERATE_SERIES(0, w * h - 1)) AS i FROM fr),
      px AS (SELECT doc_id, f, (doc_id * 7 + f * 31 + i * 13) % 256 AS v FROM px0),
      fs AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS s FROM px GROUP BY doc_id, f)
      SELECT doc_id, COUNT(*) AS n_frames,
             CAST(SUM(s) AS BIGINT) AS luma_total,
             CAST(MAX(s) AS BIGINT) AS max_frame_sum,
             TRUE AS chroma_flat, TRUE AS lossy_in_envelope
      FROM fs GROUP BY doc_id ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- m9
  /** m9 clip geometry: (width, height, frames) from doc_id — one MB row
    * per frame (two on the multi-slice docs, which need a second slice
    * to mean anything): the B-stream machinery (lists, direct modes,
    * ctts, weighting) is geometry-independent, so the smallest legal
    * pictures keep this a per-row test of ALL of it rather than a
    * pixel-volume benchmark. n odd → B pairs. */
  private def m9Geom(id: Long): (Int, Int, Int) =
    (16, if (id % 4 == 0) 32 else 16, ((id % 3) * 2 + 5).toInt)

  /** m9 source frame f: moving gradient + a 37-level DC step per frame —
    * adjacent frames differ far beyond the qp-26 quantizer envelope, so
    * src_match discriminates off-by-one ordering. */
  private def m9Frame(id: Long, w: Int, h: Int, f: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x + 2 * f) * 5 + y * 7 + f * 37 + id * 11) % 256).toByte
    }

  /** One-time-per-JVM fixture store for m9 (the m8 discipline): per doc
    * the B-frame MP4, whether its coded order really differs from
    * display order, and the encoder's normative reconstruction luma in
    * DISPLAY order (what a conformant decoder must output — the
    * display_exact comparison needs it, and re-encoding per timed pass
    * to obtain it made the bench time the allocation-heavy motion
    * search instead of the decode under test). Bench discloses via
    * `amortized`.
    */
  private val m9MediaCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureM9Media(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    m9MediaCache.computeIfAbsent(
      Tables.corpusCacheKey(s, dir, "documents"), _ => {
      val session = s
      import session.implicits._
      import graft.multimodal.h264.H264Encoder
      val path =
        java.nio.file.Files.createTempDirectory("graft-m9").toString + "/media"
      // every second document: 2.5k clips at sf0.1 already cover the
      // GOP-flavor rotation many times over
      Tables.loadSpread(s, dir, "documents").select(col("doc_id")).as[Long]
        .filter(_ % 2 == 0)
        .mapPartitions(_.map { id =>
          val (w, h, n) = m9Geom(id)
          val frames = Seq.tabulate(n)(m9Frame(id, w, h, _))
          // rotate the B-stream flavors so every decode path is ingested
          // at scale: spatial direct, temporal direct, implicit weighting
          // over POC type 1 (the cycle-derived POC feeds the weights)
          val enc = H264Encoder.encodeGray(frames, w, h,
            H264Encoder.Config(qp = 26, bFrames = true,
              sliceRows = if (id % 4 == 0) 1 else 0,
              temporalDirectB = id % 3 == 1,
              implicitWeightedB = id % 3 == 2,
              pocType1 = id % 3 == 2))
          val reordered = enc.displayOrder != enc.samples.indices
          val reconY: Seq[Array[Byte]] = (0 until n).map { d =>
            enc.recon(enc.displayOrder.indexOf(d)).y.map(_.toByte)
          }
          (id, graft.sinks.Artifacts.avcMp4(enc), reordered, reconY)
        })
        .toDF("doc_id", "mp4", "reordered", "recon_y")
        .write.mode("overwrite").parquet(path)
      path
    })

  /** B-frame (IBPBP) H.264 ingest as a first-class operator: every
    * document's clip is a real Main-profile CAVLC 'avc1' MP4 whose coded
    * order differs from display order — non-reference spatial-direct B
    * slices between P references, ctts composition offsets in the
    * container (every fourth doc also multi-slice). The engine decodes
    * through the ctts reorder window and the row pins three properties:
    * the container decode equals the encoder's normative reconstruction
    * BIT-EXACTLY in display order (`display_exact`); each decoded frame
    * is closest to ITS OWN source frame, not a neighbor (`src_match` —
    * the check that would fail if ctts ordering or the DPB were wrong
    * by one); and the stream really reorders (`reordered`). The MP4 and
    * the normative recon come from the encode-once fixture store above,
    * so the timed path is the media scan → container walk → B-frame
    * decode. Pure per-row fan-out in batched mapPartitions —
    * embarrassingly parallel over clips at any scale.
    */
  val m9BFrameVideo: QueryDef = QueryDef(
    "m9_bframe_video",
    (s, dir) => {
      val session = s
      import session.implicits._
      s.read.parquet(ensureM9Media(s, dir))
        .as[(Long, Array[Byte], Boolean, Seq[Array[Byte]])]
        .mapPartitions(_.map { case (id, mp4, reordered, reconY) =>
          val (w, h, n) = m9Geom(id)
          val video = Codec.parseVideo(mp4)
          var displayExact = video.frameCount == n
          var srcMatch = true
          (0 until video.frameCount).foreach { d =>
            val (dw, dh, _, px) = video.decodeFrame(d)
            val recon = reconY(d)
            var i = 0
            while (i < dw * dh) {
              if ((px(i * 3) & 0xFF) != (recon(i) & 0xFF)) displayExact = false
              i += 1
            }
            // sum of absolute error vs each candidate source frame
            def sad(f: Int): Long = {
              val src = m9Frame(id, w, h, f)
              var sErr = 0L
              var j = 0
              while (j < dw * dh) {
                sErr += math.abs((px(j * 3) & 0xFF) - (src(j) & 0xFF))
                j += 1
              }
              sErr
            }
            val own = sad(d)
            if (d > 0 && sad(d - 1) <= own) srcMatch = false
            if (d < n - 1 && sad(d + 1) <= own) srcMatch = false
          }
          (id, n.toLong, reordered, displayExact, srcMatch)
        })
        .toDF("doc_id", "n_frames", "reordered", "display_exact", "src_match")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, CAST((doc_id % 3) * 2 + 5 AS BIGINT) AS n_frames,
             TRUE AS reordered, TRUE AS display_exact, TRUE AS src_match
      FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""")
  )

  val all: Seq[QueryDef] =
    Seq(m1Pipeline, m2InferenceConv, m3AudioFeatures, m4ImagePhash,
      m5SceneCuts, m6AudioVad, m7Keyframes, m8H264Video, m9BFrameVideo)
}
