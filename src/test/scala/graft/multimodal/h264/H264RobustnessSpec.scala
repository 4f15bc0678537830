package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-input hardening: the decoder's contract on damaged streams
  * is DECODE-OR-REFUSE — a corrupted sample either still decodes (to
  * possibly-garbage pixels; CAVLC has no integrity check, so that is
  * unavoidable) or throws `IllegalArgumentException` with a named
  * reason. It must never escape with an index/negative-size/OOM error,
  * and never loop forever. Same contract for the MP4 container walk
  * (a corrupt stsz/ctts count must not drive a giant allocation).
  *
  * The sweep XORs bytes at a stride across every sample of every
  * supported stream family (intra, IPPP multi-ref, IBPBP + weighting,
  * long-term/MMCO, multi-slice) and truncates samples at several
  * points — ~2k mutated decodes.
  */
class H264RobustnessSpec extends AnyFunSuite {

  private def frames(w: Int, h: Int, n: Int, seed: Int): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    val noise = Array.fill(w * h)(rnd.nextInt(24))
    (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x + 2 * f) * 3 + (y + f) * 5 + noise(i)) % 256).toByte
      }
    }
  }

  private def corpora: Seq[(String, H264Encoder.Encoded)] = {
    val fs = frames(48, 32, 6, 3)
    Seq(
      "intra" -> H264Encoder.encodeGray(fs, 48, 32,
        H264Encoder.Config(qp = 26)),
      "ippp" -> H264Encoder.encodeGray(fs, 48, 32,
        H264Encoder.Config(qp = 26, pFrames = true)),
      "ibpbp-wp" -> H264Encoder.encodeGray(frames(48, 32, 7, 5), 48, 32,
        H264Encoder.Config(qp = 26, bFrames = true, implicitWeightedB = true)),
      "longterm" -> H264Encoder.encodeGray(frames(48, 32, 10, 7), 48, 32,
        H264Encoder.Config(qp = 26, pFrames = true, longTermRefs = true)),
      "multislice" -> H264Encoder.encodeGray(fs, 48, 32,
        H264Encoder.Config(qp = 26, pFrames = true, sliceRows = 1)),
      "temporal-poc1" -> H264Encoder.encodeGray(frames(48, 32, 7, 9), 48, 32,
        H264Encoder.Config(qp = 26, bFrames = true, temporalDirectB = true,
          pocType1 = true)),
      "weighted-p" -> H264Encoder.encodeGray(fs, 48, 32,
        H264Encoder.Config(qp = 26, pFrames = true, weightedPred = true)))
  }

  private def decodeAll(enc: H264Encoder.Encoded,
      mutate: (Int, Array[Byte]) => Array[Byte]): Unit = {
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zipWithIndex.foreach { case (s, i) =>
      try session.decodeSample(mutate(i, s), 4)
      catch { case _: IllegalArgumentException => () } // refusal is fine
    }
  }

  test("single-byte corruption: decode-or-refuse, never crash") {
    corpora.foreach { case (name, enc) =>
      val maxLen = enc.samples.map(_.length).max
      // corrupt one byte position at a time (stride 5) in EVERY sample,
      // under three xor patterns
      for (pos <- 4 until maxLen by 5; pattern <- Seq(0xFF, 0x80, 0x01)) {
        try decodeAll(enc, (_, s) =>
          if (pos >= s.length) s
          else { val m = s.clone(); m(pos) = (m(pos) ^ pattern).toByte; m })
        catch {
          case e: Throwable => fail(
            s"$name pos=$pos xor=$pattern escaped with ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("truncation: decode-or-refuse at every cut depth") {
    corpora.foreach { case (name, enc) =>
      for (keepNum <- Seq(1, 2, 3, 5, 7, 8)) {
        try decodeAll(enc, (_, s) =>
          java.util.Arrays.copyOf(s, math.max(5, s.length * keepNum / 8)))
        catch {
          case e: Throwable => fail(
            s"$name keep=$keepNum/8 escaped with ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("corrupt MP4 container: header field damage never allocates wild") {
    val enc = H264Encoder.encodeGray(frames(32, 32, 6, 9), 32, 32,
      H264Encoder.Config(qp = 26, pFrames = true, idrEvery = 3))
    // chunked layout + stss: the full sample-table walk under damage
    val mp4 = graft.sinks.Artifacts.avcMp4(enc, chunkSize = 2)
    // damage each byte of the moov region (it follows mdat) at stride 3
    val moovAt = {
      var p = 0
      var at = -1
      while (p + 8 <= mp4.length && at < 0) {
        val size = ((mp4(p) & 0xFF) << 24) | ((mp4(p + 1) & 0xFF) << 16) |
          ((mp4(p + 2) & 0xFF) << 8) | (mp4(p + 3) & 0xFF)
        if (new String(mp4, p + 4, 4, "US-ASCII") == "moov") at = p
        else p += size
      }
      at
    }
    assert(moovAt > 0)
    for (pos <- moovAt until mp4.length by 3) {
      val m = mp4.clone()
      m(pos) = (m(pos) ^ 0xFF).toByte
      try {
        val v = graft.multimodal.Codec.parseVideo(m)
        if (v.frameCount > 0) v.decodeFrame(0)
      } catch {
        case _: IllegalArgumentException => () // refusal is fine
        case e: Throwable => fail(
          s"pos=$pos escaped with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
