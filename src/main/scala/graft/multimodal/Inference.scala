package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Batched model-inference stage over decoded images — the engine's
  * realization of the reference's per-frame detection pass
  * (/root/reference/picoprobe/tools/temporal.py:37-55), kept
  * MODEL-PLUGGABLE per SURVEY §2 H: the session factory is the unit of
  * extension; the Spark plumbing is fixed.
  *
  * The lifecycle is the ONNX-runtime convention:
  *   - ONE session per partition: the factory runs inside `mapPartitions`
  *     on the executor, so the model object itself is never serialized
  *     (a real OrtSession is a native handle and cannot be);
  *   - fixed-size batches through the session — bounds activation memory
  *     and amortizes per-call overhead;
  *   - positional zip of results back onto inputs (a session returns one
  *     output row per input row);
  *   - `close()` when the partition drains.
  *
  * No inference runtime ships in this environment, so the bundled
  * [[ConvPoolModel]] is a REAL tiny model — fixed-weight 3×3 convolutions
  * with ReLU and global average pooling — not a stub; an OnnxModel plugs
  * in by holding `OrtEnvironment`/`OrtSession` in the same factory shape.
  */
trait ImageModel {
  def name: String
  def outputDim: Int
  /** One batch in, one score vector per image out (positional). */
  def run(batch: IndexedSeq[DecodedImage]): IndexedSeq[Array[Float]]
  def close(): Unit = ()
}

final case class Detection(media_id: Long, model: String, scores: Array[Float])

object Inference {

  implicit private val detEnc: Encoder[Detection] = Encoders.product[Detection]

  /** Run `modelFactory`'s model over every decoded image, batched. The
    * partitioning is preserved — inference adds no shuffle; at scale the
    * stage is as parallel as the upstream decode.
    */
  def infer(images: Dataset[DecodedImage], modelFactory: () => ImageModel,
      batchSize: Int = 32): Dataset[Detection] =
    images.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val model = modelFactory() // one session per partition, never shipped
        // close on task completion, not iterator drain — a downstream
        // limit/take can abandon the iterator mid-partition and a native
        // session would otherwise leak
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => model.close()))
        it.grouped(batchSize).flatMap { raw =>
          val batch = raw.toIndexedSeq
          val out = model.run(batch)
          require(out.length == batch.length,
            s"model ${model.name}: ${out.length} outputs for ${batch.length} inputs")
          batch.iterator.zip(out.iterator).map { case (img, scores) =>
            Detection(img.media_id, model.name, scores)
          }
        }
      }
    }
}

/** The fixed 3×3 kernel bank both bundled models share: identity,
  * Sobel-x, Sobel-y, Laplacian — indexed `(ky+1)*3 + (kx+1)`.
  */
object ConvKernels {
  val All: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 1, 0, 0, 0, 0),
    Array(-1, 0, 1, -2, 0, 2, -1, 0, 1),
    Array(-1, -2, -1, 0, 0, 0, 1, 2, 1),
    Array(0, -1, 0, -1, 4, -1, 0, -1, 0))
}

/** Fixed-weight 3×3 conv + ReLU + global-average-pool feature head over
  * the channel-mean plane in [0, 1], plus mean brightness — five
  * deterministic scores. Real convolution arithmetic with the compute
  * profile of a (very small) detector backbone, and exact expected values
  * are hand-computable in specs.
  */
final class ConvPoolModel extends ImageModel {

  val name = "convpool-v1"

  private val kernels: Array[Array[Float]] =
    ConvKernels.All.map(_.map(_.toFloat))

  def outputDim: Int = kernels.length + 1

  def run(batch: IndexedSeq[DecodedImage]): IndexedSeq[Array[Float]] =
    batch.map { img =>
      val w = img.width
      val h = img.height
      val c = img.channels
      // channel-mean grayscale plane in [0, 1]
      val gray = new Array[Float](w * h)
      var p = 0
      while (p < w * h) {
        var s = 0f
        var b = 0
        while (b < c) { s += (img.pixels(p * c + b) & 0xFF) / 255f; b += 1 }
        gray(p) = s / c
        p += 1
      }
      val scores = new Array[Float](kernels.length + 1)
      var k = 0
      while (k < kernels.length) {
        val kern = kernels(k)
        var acc = 0f
        var n = 0
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            var v = 0f
            var ky = -1
            while (ky <= 1) {
              var kx = -1
              while (kx <= 1) {
                v += kern((ky + 1) * 3 + (kx + 1)) * gray((y + ky) * w + (x + kx))
                kx += 1
              }
              ky += 1
            }
            acc += math.max(v, 0f) // ReLU
            n += 1
            x += 1
          }
          y += 1
        }
        scores(k) = if (n > 0) acc / n else 0f
        k += 1
      }
      var sum = 0f
      p = 0
      while (p < w * h) { sum += gray(p); p += 1 }
      scores(kernels.length) = sum / (w * h)
      scores
    }
}

/** The same kernel bank over RAW channel-summed uint8 ints, emitting the
  * per-kernel Σ relu(conv) plus the total pixel sum — every score an
  * exact integer (bounded well under 2^24, so the Float carries it
  * losslessly). This variant exists so the whole inference stage — PNG
  * decode, session lifecycle, batching, conv arithmetic — can be verified
  * by an EXACT external oracle recomputing the convolution relationally
  * (m2_inference_conv): no float-rounding tolerance anywhere.
  */
final class IntConvModel extends ImageModel {

  val name = "intconv-v1"

  def outputDim: Int = ConvKernels.All.length + 1

  def run(batch: IndexedSeq[DecodedImage]): IndexedSeq[Array[Float]] =
    batch.map { img =>
      val w = img.width
      val h = img.height
      val c = img.channels
      val raw = new Array[Int](w * h) // channel sum — integer-exact
      var p = 0
      while (p < w * h) {
        var s = 0
        var b = 0
        while (b < c) { s += img.pixels(p * c + b) & 0xFF; b += 1 }
        raw(p) = s
        p += 1
      }
      val kernels = ConvKernels.All
      val scores = new Array[Float](kernels.length + 1)
      var k = 0
      while (k < kernels.length) {
        val kern = kernels(k)
        var acc = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            var v = 0
            var ky = -1
            while (ky <= 1) {
              var kx = -1
              while (kx <= 1) {
                v += kern((ky + 1) * 3 + (kx + 1)) * raw((y + ky) * w + (x + kx))
                kx += 1
              }
              ky += 1
            }
            if (v > 0) acc += v // ReLU
            x += 1
          }
          y += 1
        }
        scores(k) = acc.toFloat
        k += 1
      }
      var total = 0L
      p = 0
      while (p < w * h) { total += raw(p); p += 1 }
      scores(kernels.length) = total.toFloat
      scores
    }
}
