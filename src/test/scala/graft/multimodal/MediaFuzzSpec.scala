package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.h264.H264Encoder
import graft.sinks.Artifacts

/** Randomized seeded mutation fuzz over every media decode path (round-13
  * latent sweep #8, the container sibling of `Hdf5FuzzSpec`).
  * `HostileContainerSpec` pins crafted attacks; this walks the space the
  * crafting missed: random bit flips, byte smears, window overwrites and
  * truncations of VALID containers produced by the engine's own encoders
  * — grayPng, pcmWav, mjpegAvi, mjpegMp4, and an H264Encoder avc1 MP4 —
  * asserting the decoders' documented hostile-input contract per mutant:
  *
  *   - terminates within a bound (no chunk-walk loop, no huge allocation
  *     stall);
  *   - reads successfully or refuses BY NAME (`IllegalArgumentException`)
  *     — never a raw JVM error out of the RIFF/BMFF/PNG/CAVLC machinery.
  *
  * Full decode per mutant: parse the container AND materialize every
  * frame / sample array, so the entropy-coded paths (JPEG via the
  * hardened ImageIO wrapper, the CAVLC H.264 decoder) are inside the
  * contract, not just the box walkers.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def jpegFrame(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach { y =>
      (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, (x * 13 + y * 7 + seed * 31) % 256))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def gray(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 13 + seed * 7) % 256).toByte)

  /** (name, valid bytes, full-decode probe). */
  private def targets(): Seq[(String, Array[Byte], Array[Byte] => Unit)] = {
    val w = 32; val h = 16
    val jpegs = (0 until 3).map(f => jpegFrame(w, h, f))
    val avc = Artifacts.avcMp4(
      H264Encoder.encodeGray((0 until 3).map(f => gray(w, h, f)), w, h,
        H264Encoder.Config(qp = 24, pFrames = true)))
    def allFrames(bytes: Array[Byte]): Unit = {
      val v = Codec.parseVideo(bytes)
      (0 until v.frameCount).foreach(v.decodeFrame)
    }
    Seq(
      ("png", Artifacts.grayPng(w, h, gray(w, h, 0)),
        b => { Codec.decodeImage(b); () }),
      ("wav", Artifacts.pcmWav(8000,
        Array.tabulate[Short](256)(i => (i * 37 % 4096).toShort)),
        b => { Codec.decodeWav(b); () }),
      ("avi", Artifacts.mjpegAvi(jpegs, w, h, fps = 5), allFrames),
      ("mp4", Artifacts.mjpegMp4(jpegs, w, h, fps = 5), allFrames),
      ("avc", avc, allFrames))
  }

  private val Kinds = Vector("bitflip", "smear", "zero4", "fill4", "truncate")
  private val PerKind = 300

  private def mutant(base: Array[Byte], kind: String, i: Int): Array[Byte] = {
    val rnd = new scala.util.Random(0x5EED13L * (Kinds.indexOf(kind) + 1) + i)
    val b = base.clone()
    kind match {
      case "bitflip" =>
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        b
      case "smear" =>
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        b
      case "zero4" =>
        val at = rnd.nextInt(b.length - 4)
        java.util.Arrays.fill(b, at, at + 4, 0.toByte)
        b
      case "fill4" =>
        val at = rnd.nextInt(b.length - 4)
        java.util.Arrays.fill(b, at, at + 4, 0xFF.toByte)
        b
      case "truncate" =>
        java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length - 1))
    }
  }

  test("every random media mutant terminates and fails only by name") {
    // CPU-time-bounded probes (graft.testfs.FuzzHarness): a hang finding
    // means the decoder actually BURNED 10 s of CPU, not that a loaded
    // host starved a healthy probe of wall-clock
    val harness = new graft.testfs.FuzzHarness("media-fuzz")
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    var ok = 0; var named = 0; var total = 0
    targets().foreach { case (fmt, base, probe) =>
      probe(base) // the un-mutated fixture must decode
      for (kind <- Kinds; i <- 0 until PerKind) {
        total += 1
        val m = mutant(base, kind, i)
        harness.probe(() => probe(m)) match {
          case Some(None) => ok += 1
          case Some(Some(_: IllegalArgumentException)) => named += 1
          case Some(Some(t)) =>
            violations += s"$fmt/$kind/$i: ${t.getClass.getName}: ${t.getMessage}"
          case None =>
            violations += s"$fmt/$kind/$i: HANG (>10s cpu)"
        }
      }
    }
    harness.shutdown()
    info(s"$total mutants: $ok clean decodes, $named named refusals, ${violations.size} violations")
    assert(violations.isEmpty,
      s"${violations.size} contract violations (first 20):\n" +
        violations.take(20).mkString("\n"))
  }
}
