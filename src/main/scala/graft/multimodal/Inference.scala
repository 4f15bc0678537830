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
        val results = it.grouped(batchSize).flatMap { raw =>
          val batch = raw.toIndexedSeq
          val out = model.run(batch)
          require(out.length == batch.length,
            s"model ${model.name}: ${out.length} outputs for ${batch.length} inputs")
          batch.iterator.zip(out.iterator).map { case (img, scores) =>
            Detection(img.media_id, model.name, scores)
          }
        }
        new Iterator[Detection] {
          def hasNext: Boolean = {
            val h = results.hasNext
            if (!h) model.close()
            h
          }
          def next(): Detection = results.next()
        }
      }
    }
}

/** Fixed-weight 3×3 conv + ReLU + global-average-pool feature head:
  * identity, Sobel-x, Sobel-y, Laplacian kernels over the channel-mean
  * plane, plus mean brightness — five deterministic scores in [0, ~4].
  * Real convolution arithmetic with the compute profile of a (very small)
  * detector backbone, and exact expected values are hand-computable in
  * specs.
  */
final class ConvPoolModel extends ImageModel {

  val name = "convpool-v1"

  private val kernels: Array[Array[Float]] = Array(
    Array(0, 0, 0, 0, 1, 0, 0, 0, 0),
    Array(-1, 0, 1, -2, 0, 2, -1, 0, 1),
    Array(-1, -2, -1, 0, 0, 0, 1, 2, 1),
    Array(0, -1, 0, -1, 4, -1, 0, -1, 0))

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
