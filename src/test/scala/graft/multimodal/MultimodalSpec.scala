package graft.multimodal

import graft.SparkSpec
import graft.sinks.Artifacts

/** Multimodal pipeline tests over REAL encoded media: javax.imageio
  * decode (values pinned exactly through the lossless PNG path), AVI
  * container parse + frame sampling, resize geometry, partition
  * preservation (no shuffle).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  /** Deterministic test pixels. */
  private def px(n: Int, salt: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + salt) & 0xFF).toByte)

  /** RGB PNG via the JDK encoder (the sink side only does grayscale). */
  private def rgbPng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(i) & 0xFF) << 16) | ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private lazy val grayPixels = px(8 * 6, 1)
  private lazy val rgbPixels = px(4 * 4 * 3, 2)

  private lazy val media = Seq(
    Media(1L, "image", rgbPng(4, 4, rgbPixels), MediaMeta(4, 4, 3, 0, 0, "png")),
    Media(2L, "image", Artifacts.grayPng(8, 6, grayPixels), MediaMeta(8, 6, 1, 0, 0, "png")),
    Media(3L, "video",
      Artifacts.mjpegAvi(
        // visually distinct frames: flat black vs flat bright
        Seq.tabulate(10)(f => Artifacts.grayJpeg(2, 2, Array.fill(4)(if (f % 2 == 0) 0 else 200).map(_.toByte))),
        2, 2),
      MediaMeta(2, 2, 1, 0, 10, "avi"))
  ).toDS().repartition(2)

  test("decodeImages: real javax.imageio decode, exact values via PNG") {
    val imgs = Multimodal.decodeImages(media.filter(_.kind == "image"))
      .collect().sortBy(_.media_id)
    val rgb = imgs(0)
    assert((rgb.width, rgb.height, rgb.channels) == ((4, 4, 3)))
    assert(rgb.pixels.toSeq == rgbPixels.toSeq) // PNG is lossless — bit-exact
    val gray = imgs(1)
    assert((gray.width, gray.height, gray.channels) == ((8, 6, 1)))
    assert(gray.pixels.toSeq == grayPixels.toSeq)
  }

  test("resize: geometry and nearest-neighbor identity at same size") {
    val imgs = Multimodal.decodeImages(media.filter(_.media_id == 2L))
    val half = Multimodal.resize(imgs, 4, 3).collect()(0)
    assert(half.width == 4 && half.height == 3 && half.pixels.length == 4 * 3)
    val same = Multimodal.resize(imgs, 8, 6).collect()(0)
    assert(same.pixels.toSeq == grayPixels.toSeq)
    // corner pixel maps to source corner
    assert(half.pixels(0) == grayPixels(0))
  }

  test("sampleFrames: container-indexed every-Nth decode") {
    val frames = Multimodal.sampleFrames(media.filter(_.kind == "video"), 3).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9)) // ceil(10/3)=4
    assert(frames.forall(_.frame.length == 2 * 2))
    // JPEG is lossy but flat frames stay near-flat: even frames dark, odd bright
    val f0 = frames.find(_.frame_idx == 0).get.frame.map(_ & 0xFF)
    val f3 = frames.find(_.frame_idx == 3).get.frame.map(_ & 0xFF)
    assert(f0.forall(_ < 64) && f3.forall(_ > 128))
  }

  test("decode -> resize -> featurize end-to-end on a known image") {
    val one = media.filter(_.media_id == 2L)
    val small = Multimodal.resize(Multimodal.decodeImages(one), 2, 2).collect()(0)
    // nearest-neighbor from the exact decoded grid: (y*3, x*4) sources
    val expect = for (y <- 0 until 2; x <- 0 until 2)
      yield grayPixels((y * 3) * 8 + x * 4)
    assert(small.pixels.toSeq == expect)
    val feats = Multimodal.extractFeatures(one, dim = 16).collect()(0)
    assert(feats.features.length == 16)
    assert(feats.features.forall(v => v > -1.0f && v < 1.0f))
  }

  test("extractFeatures: fixed dim, bounded values, distinct content") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == 16))
    assert(feats(0).features.toSeq != feats(1).features.toSeq)
  }

  test("pipeline preserves partitioning (no shuffle)") {
    val n = media.rdd.getNumPartitions
    assert(Multimodal.decodeImages(media.filter(_.kind == "image")).rdd.getNumPartitions ==
      media.filter(_.kind == "image").rdd.getNumPartitions)
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions == n)
  }
}
