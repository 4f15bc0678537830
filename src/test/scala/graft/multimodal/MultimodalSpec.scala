package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing tests: schema/shape contracts, determinism, resize
  * geometry, frame-sampling fan-out, partition preservation (no shuffle).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private lazy val media = Seq(
    Media(1L, "image", "img-one".getBytes, MediaMeta(8, 6, 3, 0, 0, "png")),
    Media(2L, "image", "img-two".getBytes, MediaMeta(4, 4, 1, 0, 0, "png")),
    Media(3L, "video", "vid".getBytes, MediaMeta(2, 2, 1, 0, 10, "mp4"))
  ).toDS().repartition(2)

  test("decodeImages: length contract + determinism") {
    val imgs = Multimodal.decodeImages(media.filter(_.kind == "image"))
    val r = imgs.collect().sortBy(_.media_id)
    assert(r(0).pixels.length == 8 * 6 * 3)
    assert(r(1).pixels.length == 4 * 4 * 1)
    val again = Multimodal.decodeImages(media.filter(_.kind == "image"))
      .collect().sortBy(_.media_id)
    assert(r(0).pixels.toSeq == again(0).pixels.toSeq)
  }

  test("resize: geometry and nearest-neighbor identity at same size") {
    val imgs = Multimodal.decodeImages(media.filter(_.media_id == 1L))
    val half = Multimodal.resize(imgs, 4, 3).collect()(0)
    assert(half.width == 4 && half.height == 3 && half.pixels.length == 4 * 3 * 3)
    val same = Multimodal.resize(imgs, 8, 6).collect()(0)
    assert(same.pixels.toSeq == imgs.collect()(0).pixels.toSeq)
    // corner pixel maps to source corner
    val src = imgs.collect()(0)
    assert(half.pixels(0) == src.pixels(0))
  }

  test("sampleFrames: every-Nth fan-out with distinct frames") {
    val frames = Multimodal.sampleFrames(media.filter(_.kind == "video"), 3).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9)) // ceil(10/3)=4
    assert(frames.forall(_.frame.length == 2 * 2 * 1))
    val f0 = frames.find(_.frame_idx == 0).get.frame.toSeq
    val f3 = frames.find(_.frame_idx == 3).get.frame.toSeq
    assert(f0 != f3)
  }

  test("extractFeatures: fixed dim, bounded values, deterministic") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(_.features.forall(v => v > -1.0f && v < 1.0f)))
    assert(feats(0).features.toSeq !=
      feats(1).features.toSeq) // different content -> different vector
  }

  test("pipeline preserves partitioning (no shuffle)") {
    val n = media.rdd.getNumPartitions
    assert(Multimodal.decodeImages(media).rdd.getNumPartitions == n)
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions == n)
  }
}
