package graft.multimodal

/** Real ONNX-runtime binding behind [[ImageModel]], loaded by REFLECTION:
  * the sandbox ships no inference runtime and the build adds no
  * dependencies, so `ai.onnxruntime` resolves at RUNTIME when (and only
  * when) a deployment puts the jar on the executor classpath — zero
  * plumbing changes, the factory drops into [[Inference.infer]] exactly
  * like [[ConvPoolModel]] does. Everything else about the lifecycle
  * (one session per partition, fixed batches, close on task completion)
  * is already enforced by the plumbing.
  *
  * Reference counterpart: the per-frame detection pass of
  * /root/reference/picoprobe/tools/temporal.py:37-55, whose model is an
  * external artifact loaded by path — the same contract as `modelPath`
  * here.
  */
object OnnxRuntime {

  /** True when the ONNX runtime is on this JVM's classpath. */
  lazy val available: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  /** Session factory for [[Inference.infer]]. Fails fast (with the fix)
    * when no runtime is present rather than failing per-partition later.
    */
  def modelFactory(modelPath: String, inputName: String,
      outputDim: Int): () => ImageModel = {
    require(available,
      "ai.onnxruntime not on the classpath — add the onnxruntime jar to " +
        "spark.jars (no code changes needed)")
    () => new OnnxModel(modelPath, inputName, outputDim)
  }
}

/** One OrtSession over a model file. Input: NCHW float32 (n, 1, h, w)
  * gray planes in [0, 1] (the [[ConvPoolModel]] normalization); output:
  * the first result tensor as one float vector per input row. All
  * runtime types are touched reflectively so this class LOADS without
  * the jar; constructing it without one throws the [[OnnxRuntime]]
  * message instead of NoClassDefFoundError.
  */
final class OnnxModel(modelPath: String, inputName: String,
    val outputDim: Int) extends ImageModel {

  require(OnnxRuntime.available,
    "ai.onnxruntime not on the classpath")

  val name = s"onnx:${new java.io.File(modelPath).getName}"

  private val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
  private val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
  private val sessionCls = Class.forName("ai.onnxruntime.OrtSession")
  private val valueCls = Class.forName("ai.onnxruntime.OnnxValue")
  private val env = envCls.getMethod("getEnvironment").invoke(null)
  private val session =
    envCls.getMethod("createSession", classOf[String]).invoke(env, modelPath)

  def run(batch: IndexedSeq[DecodedImage]): IndexedSeq[Array[Float]] = {
    if (batch.isEmpty) return IndexedSeq.empty
    val h = batch.head.height
    val w = batch.head.width
    require(batch.forall(i => i.height == h && i.width == w),
      "ONNX batch requires uniform image dimensions (resize upstream)")
    val buf = java.nio.FloatBuffer.allocate(batch.length * h * w)
    batch.foreach { img =>
      val c = img.channels
      var p = 0
      while (p < w * h) {
        var s = 0f
        var b = 0
        while (b < c) { s += (img.pixels(p * c + b) & 0xFF) / 255f; b += 1 }
        buf.put(s / c)
        p += 1
      }
    }
    buf.flip()
    val shape = Array(batch.length.toLong, 1L, h.toLong, w.toLong)
    val tensor = tensorCls
      .getMethod("createTensor", envCls, classOf[java.nio.FloatBuffer],
        classOf[Array[Long]])
      .invoke(null, env, buf, shape)
    try {
      val result = sessionCls
        .getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session, java.util.Collections.singletonMap(inputName, tensor))
      try {
        val first = result.asInstanceOf[java.lang.Iterable[
          java.util.Map.Entry[String, AnyRef]]].iterator().next().getValue
        val out = valueCls.getMethod("getValue").invoke(first)
          .asInstanceOf[Array[Array[Float]]]
        require(out.length == batch.length,
          s"$name returned ${out.length} rows for ${batch.length} inputs")
        out.toIndexedSeq
      } finally result.asInstanceOf[AutoCloseable].close()
    } finally tensor.asInstanceOf[AutoCloseable].close()
  }

  override def close(): Unit =
    session.asInstanceOf[AutoCloseable].close()
}
