package graft.multimodal

import graft.SparkSpec

/** Batched inference stage: session-per-partition lifecycle, batch
  * shapes, positional result zip, and the conv model's arithmetic pinned
  * against hand-computed values.
  */
/** A model that records its lifecycle through accumulators (top-level so
  * the factory closure captures only the serializable accumulators).
  */
private class CountingModel(
    sessions: org.apache.spark.util.LongAccumulator,
    batches: org.apache.spark.util.LongAccumulator) extends ImageModel {
  sessions.add(1)
  val name = "counting"
  val outputDim = 1
  def run(batch: IndexedSeq[DecodedImage]): IndexedSeq[Array[Float]] = {
    batches.add(1)
    batch.map(img => Array(img.media_id.toFloat))
  }
}

class InferenceSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("OnnxModel: factory fails fast without a runtime; runs when present") {
    if (!OnnxRuntime.available) {
      // no runtime in this sandbox: the factory must say exactly what to
      // add, and must not surface as NoClassDefFoundError per-partition
      val e = intercept[IllegalArgumentException](
        OnnxRuntime.modelFactory("/tmp/model.onnx", "input", 5))
      assert(e.getMessage.contains("onnxruntime"))
    } else {
      // a deployment with the jar: the factory plugs into the same
      // plumbing as every bundled model (zero code changes)
      assume(new java.io.File("/tmp/model.onnx").exists(),
        "runtime present but no model artifact to load")
      val factory = OnnxRuntime.modelFactory("/tmp/model.onnx", "input", 5)
      assert(factory().name.startsWith("onnx:"))
    }
  }

  test("one session per partition, fixed-size batches, positional results") {
    val sessions = spark.sparkContext.longAccumulator("sessions")
    val batches = spark.sparkContext.longAccumulator("batches")
    val images = (1L to 20L).map(i =>
      DecodedImage(i, 2, 2, 1, Array.fill(4)(i.toByte))).toDS().repartition(2)
    val out = Inference.infer(images, () => new CountingModel(sessions, batches),
      batchSize = 4).collect()
    assert(out.length == 20)
    // positional zip: each detection carries its own image's id
    out.foreach(d => assert(d.scores(0) == d.media_id.toFloat))
    assert(sessions.value == 2, s"expected one session per partition")
    assert(batches.value == 5 || batches.value == 6, // 20 rows / batch 4, split across 2 partitions
      s"unexpected batch count ${batches.value}")
  }

  test("ConvPoolModel: hand-computed kernels on a known 3x3 image") {
    // gray plane (0..1): a vertical step edge — left column 0, others 255
    val px = Array[Byte](0, -1, -1, 0, -1, -1, 0, -1, -1) // -1 = 255 unsigned
    val img = DecodedImage(7L, 3, 3, 1, px)
    val scores = (new ConvPoolModel).run(IndexedSeq(img))(0)
    assert(scores.length == 5)
    // single interior pixel (1,1): identity = gray(1,1) = 1.0
    assert(scores(0) == 1.0f)
    // sobel-x at (1,1): (-1-2-1)*0 + (1+2+1)*1 = 4, relu → 4
    assert(scores(1) == 4.0f)
    // sobel-y: rows identical → 0
    assert(scores(2) == 0.0f)
    // laplacian at (1,1): 4*1 - (0 + 1 + 1 + 1) = 1
    assert(scores(3) == 1.0f)
    // mean brightness: 6 of 9 pixels at 1.0
    assert(math.abs(scores(4) - 6f / 9f) < 1e-6f)
  }

  test("end-to-end: encode PNG -> decode -> infer is deterministic") {
    val media = Seq.tabulate(6) { i =>
      val px = Array.tabulate(16)(p => ((p * 17 + i * 31) & 0xFF).toByte)
      Media(i.toLong, "image", graft.sinks.Artifacts.grayPng(4, 4, px),
        MediaMeta(4, 4, 1, 0, 0, "png"))
    }.toDS()
    def run() = Inference.infer(Multimodal.decodeImages(media),
      () => new ConvPoolModel).collect().sortBy(_.media_id)
    val a = run()
    val b = run()
    assert(a.length == 6)
    assert(a.map(_.scores.toSeq).toSeq == b.map(_.scores.toSeq).toSeq)
    assert(a.forall(_.model == "convpool-v1"))
  }
}
