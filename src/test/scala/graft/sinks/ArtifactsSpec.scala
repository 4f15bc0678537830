package graft.sinks

import graft.SparkSpec
import javax.imageio.ImageIO
import java.io.ByteArrayInputStream

/** Artifact sinks (SURVEY §2 A13): real PNG/JPEG encoding, the MJPEG-AVI
  * container structure, per-experiment assembly from long-form rows, and
  * the atomic file writer.
  */
class ArtifactsSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("grayPng roundtrips pixels exactly") {
    val px = Array.tabulate(12)(i => (i * 20).toByte)
    val png = Artifacts.grayPng(4, 3, px)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth == 4 && img.getHeight == 3)
    val back = new Array[Byte](12)
    img.getRaster.getDataElements(0, 0, 4, 3, back)
    assert(back.toSeq == px.toSeq)
  }

  test("mjpegAvi: RIFF structure and decodable frames") {
    val frames = (0 until 5).map(f =>
      Artifacts.grayJpeg(8, 6, Array.tabulate(48)(i => ((i + f * 40) % 256).toByte)))
    val avi = Artifacts.mjpegAvi(frames, 8, 6, fps = 25)
    def fourcc(at: Int) = new String(avi.slice(at, at + 4), "US-ASCII")
    def u32(at: Int) = (0 until 4).map(i => (avi(at + i) & 0xFFL) << (8 * i)).sum
    assert(fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
    assert(u32(4) == avi.length - 8) // RIFF size spans the whole file
    assert(fourcc(12) == "LIST" && fourcc(20) == "hdrl")
    assert(u32(32) == 1000000 / 25) // avih µs/frame
    assert(u32(48) == 5)            // avih total frames
    // first movi chunk is a JPEG that decodes at the right geometry
    val movi = avi.indexOfSlice("movi".getBytes)
    assert(fourcc(movi + 4) == "00dc")
    val len = u32(movi + 8).toInt
    val img = ImageIO.read(new ByteArrayInputStream(avi.slice(movi + 12, movi + 12 + len)))
    assert(img.getWidth == 8 && img.getHeight == 6)
    // index holds one keyframe entry per frame, first offset = 4
    val idx = avi.indexOfSlice("idx1".getBytes)
    assert(u32(idx + 4) == 16L * 5)
    assert(u32(idx + 16) == 4)
  }

  test("mjpegMp4: ISO-BMFF roundtrip through the box-tree parser") {
    val frames = (0 until 5).map(f =>
      Artifacts.grayJpeg(8, 6, Array.tabulate(48)(i => ((i + f * 40) % 256).toByte)))
    val mp4 = Artifacts.mjpegMp4(frames, 8, 6, fps = 25)
    def fourcc(at: Int) = new String(mp4.slice(at, at + 4), "US-ASCII")
    def be32(at: Int) = (0 until 4).map(i => (mp4(at + i) & 0xFFL) << (8 * (3 - i))).sum
    // box framing: ftyp first, boxes tile the file exactly
    assert(fourcc(4) == "ftyp" && fourcc(8) == "isom")
    var p = 0L; var boxes = List.empty[String]
    while (p < mp4.length) { boxes ::= fourcc(p.toInt + 4); p += be32(p.toInt) }
    assert(p == mp4.length, s"boxes overrun: $p vs ${mp4.length}")
    assert(boxes.reverse == List("ftyp", "mdat", "moov"))

    // parser indexes every frame; each decodes at the right geometry and
    // matches the byte-identical JPEG that went in
    val v = graft.multimodal.Codec.parseMp4(mp4)
    assert(v.frameCount == 5)
    (0 until 5).foreach { i =>
      val (w, h, _, _) = v.decodeFrame(i)
      assert(w == 8 && h == 6)
    }
    // container dispatch: magic-based, both containers of the same frames
    val viaDispatch = graft.multimodal.Codec.parseVideo(mp4)
    assert(viaDispatch.frameCount == 5)
    val avi = graft.multimodal.Codec.parseVideo(
      Artifacts.mjpegAvi(frames, 8, 6, fps = 25))
    assert(avi.frameCount == 5)
    assert(avi.decodeFrame(2)._4.toSeq == v.decodeFrame(2)._4.toSeq)
  }

  test("intensityPngs + videoArtifacts assemble per experiment") {
    val intensity = Seq(
      ("e1", 0, 0, 0, 10.0), ("e1", 0, 0, 1, 20.0),
      ("e1", 0, 1, 0, 30.0), ("e1", 0, 1, 1, 40.0),
      ("e2", 0, 0, 0, 5.0), ("e2", 0, 0, 1, 5.0))
      .toDF("experiment_id", "signal_idx", "x", "y", "intensity")
    val pngs = Artifacts.intensityPngs(intensity).collect().toMap
    assert(pngs.keySet == Set("e1.png", "e2.png"))
    val e1 = ImageIO.read(new ByteArrayInputStream(pngs("e1.png")))
    assert(e1.getWidth == 2 && e1.getHeight == 2)
    val px = new Array[Byte](4)
    e1.getRaster.getDataElements(0, 0, 2, 2, px)
    // min-max normalization with the reference rounding: 10→0, 40→255
    assert(px.map(_ & 0xFF).toSeq == Seq(0, 85, 170, 255))
    // constant image → all zeros (the max==min branch)
    val e2 = ImageIO.read(new ByteArrayInputStream(pngs("e2.png")))
    val p2 = new Array[Byte](2)
    e2.getRaster.getDataElements(0, 0, 2, 1, p2)
    assert(p2.toSeq == Seq(0.toByte, 0.toByte))

    val frames = Seq(
      ("e1", 0, 0, 0, 0, 0), ("e1", 0, 0, 0, 1, 64),
      ("e1", 0, 0, 1, 0, 128), ("e1", 0, 0, 1, 1, 255),
      ("e1", 0, 1, 0, 0, 255), ("e1", 0, 1, 0, 1, 0),
      ("e1", 0, 1, 1, 0, 0), ("e1", 0, 1, 1, 1, 0))
      .toDF("experiment_id", "signal_idx", "frame", "x", "y", "v8")
    val avis = Artifacts.videoArtifacts(frames, fps = 10).collect().toMap
    assert(avis.keySet == Set("e1.avi"))
    val avi = avis("e1.avi")
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    def u32(at: Int) = (0 until 4).map(i => (avi(at + i) & 0xFFL) << (8 * i)).sum
    assert(u32(48) == 2) // two frames
  }

  test("writeFiles: atomic, idempotent on rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts")
    val ds = Seq(("a/b.png", Array[Byte](1, 2, 3)), ("c.avi", Array[Byte](9))).toDS()
    Artifacts.writeFiles(ds, dir.toString)
    Artifacts.writeFiles(ds, dir.toString) // replay must replace, not fail
    assert(java.nio.file.Files.readAllBytes(dir.resolve("a/b.png")).toSeq == Seq[Byte](1, 2, 3))
    assert(java.nio.file.Files.exists(dir.resolve("c.avi")))
    assert(!java.nio.file.Files.exists(dir.resolve("c.avi.tmp")))
  }

  // Pins the executor-side writer resolving through the dir's own
  // filesystem: a URI-form output dir (file:/...) was invisible to the old
  // java.nio writer — on a cluster (hdfs://) every artifact landed on some
  // worker's local disk and "succeeded".
  test("writeFiles honors a URI-form output dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts-uri")
    val ds = Seq(("x/y.png", Array[Byte](7, 8))).toDS()
    Artifacts.writeFiles(ds, "file:" + dir)
    assert(java.nio.file.Files.readAllBytes(dir.resolve("x/y.png")).toSeq == Seq[Byte](7, 8))
  }

  test("writeFiles rejects a relative path escaping the output dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts-esc")
    val ds = Seq(("../escape.bin", Array[Byte](1))).toDS()
    val e = intercept[Exception] { Artifacts.writeFiles(ds, dir.toString) }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(
      _.contains("escapes the output directory"))), e.toString)
    assert(!java.nio.file.Files.exists(dir.getParent.resolve("escape.bin")))
  }
}
