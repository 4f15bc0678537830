package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal binary-column processing (builder north-star; SURVEY §2 A4/H
  * generalized): image/audio/video as opaque `BINARY` content plus a typed
  * metadata struct, with decode / resize / frame-sample / feature-extract
  * as `mapPartitions` stages — the Scala analog of `mapInPandas`: the
  * executor walks each partition in fixed-size batches, never materializing
  * more than one batch of decoded media at a time, and the partitioning is
  * preserved (no shuffle anywhere in this module).
  *
  * DECODE IS A STUB: the container has no image/audio codecs, so
  * [[FakeCodec]] produces a deterministic pseudo-decode from the bytes.
  * Everything downstream of the codec boundary — schemas, batch shape,
  * resize geometry, frame sampling, feature layout — is real and tested;
  * swapping in javax.imageio / jcodec touches only [[FakeCodec.decode]].
  */
final case class MediaMeta(
    width: Int, height: Int, channels: Int,
    sampleRate: Int, nFrames: Int, format: String)

final case class Media(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

final case class DecodedImage(
    media_id: Long, width: Int, height: Int, channels: Int, pixels: Array[Byte])

final case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

final case class MediaFeatures(media_id: Long, features: Array[Float])

/** STUB codec — deterministic stand-in for a real decoder. */
object FakeCodec {
  /** Pseudo-decode `n` bytes from content: position-mixed byte stream.
    * ??? in spirit — replace with a real codec; signature and output
    * contract (row-major uint8, length = w·h·c) are the real ones.
    */
  def decode(content: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    val len = math.max(content.length, 1)
    var i = 0
    while (i < n) {
      val b = if (content.isEmpty) 0 else content(i % len) & 0xFF
      out(i) = ((b ^ (i * 31)) & 0xFF).toByte
      i += 1
    }
    out
  }
}

object Multimodal {

  implicit private val mediaEnc: Encoder[Media] = Encoders.product[Media]
  implicit private val imgEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
  implicit private val frameEnc: Encoder[VideoFrame] = Encoders.product[VideoFrame]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Batch size of the per-partition loop — the `mapInPandas` batch-shape
    * analog; bounds decoded-media memory per task.
    */
  val BatchSize = 64

  /** Decode images: one row per image, pixels row-major (y, x, channel). */
  def decodeImages(media: Dataset[Media]): Dataset[DecodedImage] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val n = m.meta.width * m.meta.height * m.meta.channels
          DecodedImage(m.media_id, m.meta.width, m.meta.height, m.meta.channels,
            FakeCodec.decode(m.content, n))
        }
      }
    }

  /** Nearest-neighbor resize of decoded images — real array math on the
    * row-major pixel layout; partition-local, codegen-free but allocation-
    * bounded by BatchSize upstream.
    */
  def resize(images: Dataset[DecodedImage], outW: Int, outH: Int): Dataset[DecodedImage] =
    images.map { img =>
      val out = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            out((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, outW, outH, img.channels, out)
    }

  /** Sample every `everyN`-th frame of each video (1 file → ⌈T/n⌉ rows,
    * the flatMap/UDTF shape of SURVEY §2 H). Frame bytes come from the
    * stub codec; the fan-out, indexing and batching are real.
    */
  def sampleFrames(media: Dataset[Media], everyN: Int): Dataset[VideoFrame] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val frameBytes = m.meta.width * m.meta.height * m.meta.channels
          val sampled = Range(0, m.meta.nFrames, everyN)
          if (sampled.isEmpty) Iterator.empty
          else {
            // decode ONCE per video up to the last sampled frame, then
            // slice — re-decoding from the stream start per frame would be
            // Σf = O(T²) work per video with a real codec
            val all = FakeCodec.decode(m.content, frameBytes * (sampled.last + 1))
            sampled.iterator.map { f =>
              VideoFrame(m.media_id, f,
                java.util.Arrays.copyOfRange(all, frameBytes * f, frameBytes * (f + 1)))
            }
          }
        }
      }
    }

  /** Feature extraction: fixed-dim Float vector per item via a rolling
    * hash over the content — the batched-inference stage shape (ONNX/YOLO
    * analog, SURVEY §2 H ML-inference mapping). Deterministic; dim and
    * batching are the real contract.
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val acc = new Array[Long](dim)
          var i = 0
          while (i < m.content.length) {
            acc(i % dim) = acc(i % dim) * 31 + (m.content(i) & 0xFF)
            i += 1
          }
          MediaFeatures(m.media_id,
            acc.map(v => ((v % 1000003L).toFloat / 1000003.0f)))
        }
      }
    }
}
