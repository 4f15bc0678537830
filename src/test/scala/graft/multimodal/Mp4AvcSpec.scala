package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.h264.{H264Encoder, Nal, H264Decoder}
import graft.sinks.Artifacts

/** The H.264-in-MP4 ingest path end to end: encoder samples → 'avc1'
  * sample entry + avcC → container parse (magic dispatch) → per-frame
  * decode through [[Codec.Mp4Video]]. Pins the YCbCr channel layout, the
  * bit-exact luma (decoder == encoder recon through the container), the
  * PCM-lossless path, MJPEG non-regression inside the refactored muxer,
  * and fail-fast for a foreign codec fourcc.
  */
class Mp4AvcSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 13 + seed * 7) % 256).toByte)

  test("avc1 MP4 round-trip: container parse + per-frame luma equals recon") {
    val w = 32; val h = 16
    val frames = (0 until 4).map(f => gray(w, h, f))
    val enc = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 24))
    val mp4 = Artifacts.avcMp4(enc)
    val video = Codec.parseVideo(mp4)
    assert(video.isInstanceOf[Codec.Mp4Video])
    assert(video.frameCount == 4)
    (0 until 4).foreach { f =>
      val (dw, dh, c, px) = video.decodeFrame(f)
      assert((dw, dh, c) == (w, h, 3), "geometry + YCbCr channel count")
      val recon = enc.recon(f)
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == recon.y(i), s"luma frame $f px $i")
      }
      // flat-128 coded chroma must decode flat through upsampling
      assert((0 until w * h).forall(i => (px(i * 3 + 1) & 0xFF) == 128))
      assert((0 until w * h).forall(i => (px(i * 3 + 2) & 0xFF) == 128))
    }
  }

  test("avc1 MP4 with I_PCM is bit-lossless through the container") {
    val w = 18; val h = 10 // cropped, non-MB-aligned
    val frames = (0 until 3).map(f => gray(w, h, f + 9))
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 28, pcmEvery = 1))
    val video = Codec.parseVideo(Artifacts.avcMp4(enc))
    (0 until 3).foreach { f =>
      val (dw, dh, c, px) = video.decodeFrame(f)
      assert((dw, dh, c) == (w, h, 3))
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == (frames(f)(i) & 0xFF), s"frame $f px $i")
      }
    }
  }

  test("MJPEG MP4 still parses and decodes (muxer refactor non-regression)") {
    val w = 6; val h = 4
    val jpegs = (0 until 3).map(f => Artifacts.grayJpeg(w, h, gray(w, h, f)))
    val video = Codec.parseVideo(Artifacts.mjpegMp4(jpegs, w, h))
    assert(video.frameCount == 3)
    val (dw, dh, c, _) = video.decodeFrame(1)
    assert((dw, dh, c) == (w, h, 1))
  }

  test("foreign codec fourcc fails fast by name") {
    val w = 32; val h = 16
    val enc = H264Encoder.encodeGray(Seq(gray(w, h, 1)), w, h)
    val mp4 = Artifacts.avcMp4(enc)
    // flip the sample-entry fourcc to hev1 (HEVC)
    val idx = indexOfSlice(mp4, "avc1".getBytes("US-ASCII"))
    assert(idx > 0)
    val broken = mp4.clone()
    System.arraycopy("hev1".getBytes("US-ASCII"), 0, broken, idx, 4)
    val e = intercept[IllegalArgumentException](Codec.parseVideo(broken))
    assert(e.getMessage.contains("hev1"))
  }

  test("IPPP MP4: sequential access decodes through the session, seeks restart") {
    val w = 32; val h = 32
    val frames = (0 until 6).map { f =>
      Array.tabulate(w * h)(i => (((i % w) * 2 + (i / w) * 3 + f * 5) % 256).toByte)
    }
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 24, pFrames = true))
    val video = Codec.parseVideo(Artifacts.avcMp4(enc)).asInstanceOf[Codec.Mp4Video]
    assert(video.frameCount == 6)
    // forward sequential (the sampler's access pattern)
    Seq(0, 2, 4, 5).foreach { f =>
      val (_, _, c, px) = video.decodeFrame(f)
      assert(c == 3)
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == enc.recon(f).y(i), s"frame $f px $i")
      }
    }
    // backward seek restarts from the stream head and still matches
    val (_, _, _, px1) = video.decodeFrame(1)
    (0 until w * h).foreach { i =>
      assert((px1(i * 3) & 0xFF) == enc.recon(1).y(i), s"reseek px $i")
    }
  }

  test("B-frame MP4: ctts recovers display order through the reorder window") {
    val w = 48; val h = 32
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(w * h)(rnd.nextInt(24))
    val frames = (0 until 7).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x + 2 * f) * 3 + (y + f) * 5 + noise(i)) % 256).toByte
      }
    }
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true))
    assert(enc.display == Seq(0, 2, 1, 4, 3, 6, 5), "decode order reorders")
    val video = Codec.parseVideo(Artifacts.avcMp4(enc)).asInstanceOf[Codec.Mp4Video]
    assert(video.frameCount == 7)
    // recon is in DECODE order; displayIdx d lives at sample display.indexOf(d)
    def reconOf(d: Int): H264Decoder.Frame = enc.recon(enc.display.indexOf(d))
    // ascending display scan (the sampler's pattern): every frame exact,
    // despite samples decoding out of display order
    (0 until 7).foreach { d =>
      val (dw, dh, c, px) = video.decodeFrame(d)
      assert((dw, dh, c) == (w, h, 3))
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == reconOf(d).y(i), s"display $d px $i")
      }
    }
    // strided sampling (everyN = 2) on a fresh parse
    val v2 = Codec.parseVideo(Artifacts.avcMp4(enc)).asInstanceOf[Codec.Mp4Video]
    Seq(0, 2, 4, 6).foreach { d =>
      val (_, _, _, px) = v2.decodeFrame(d)
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == reconOf(d).y(i), s"strided $d px $i")
      }
    }
    // backward seek restarts the session and still matches
    val (_, _, _, px3) = v2.decodeFrame(3)
    (0 until w * h).foreach { i =>
      assert((px3(i * 3) & 0xFF) == reconOf(3).y(i), s"reseek px $i")
    }
    // the sampleFrames stage consumes the same video in display order
    val muxed = Artifacts.avcMp4(enc)
    val parsed = Codec.parseVideo(muxed)
    assert(parsed.frameCount == 7)
  }

  test("multi-chunk stsc/stco: interleaving-muxer layout parses and decodes") {
    val w = 32; val h = 16
    val frames = (0 until 9).map(f => gray(w, h, f + 5))
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 24, pFrames = true))
    // chunkSize 2 → chunks of (3,2,2,2) samples, TWO stsc runs
    val mp4 = Artifacts.avcMp4(enc, chunkSize = 2)
    val single = Artifacts.avcMp4(enc)
    assert(mp4.toSeq != single.toSeq, "chunked layout must differ")
    val video = Codec.parseVideo(mp4).asInstanceOf[Codec.Mp4Video]
    assert(video.frameCount == 9)
    (0 until 9).foreach { f =>
      val (_, _, _, px) = video.decodeFrame(f)
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == enc.recon(f).y(i), s"chunked frame $f px $i")
      }
    }
  }

  test("stss sync table: seeks restart at the nearest keyframe, not the head") {
    val w = 32; val h = 32
    val frames = (0 until 12).map { f =>
      Array.tabulate(w * h)(i => (((i % w) * 2 + (i / w) * 3 + f * 5) % 256).toByte)
    }
    // IDR every 4 display frames → syncs at samples 0, 4, 8
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 24, pFrames = true, idrEvery = 4))
    assert(enc.sampleIsIdr == Seq(true, false, false, false, true, false,
      false, false, true, false, false, false))
    val mp4 = Artifacts.avcMp4(enc)
    // the muxer wrote an stss box listing exactly the IDRs
    val video = Codec.parseVideo(mp4).asInstanceOf[Codec.Mp4Video]
    // jump straight to frame 9: the keyframe-aware path decodes from
    // sample 8, never touching GOPs 0 and 1 — then a backward seek into
    // GOP 1 restarts from sample 4
    for (f <- Seq(9, 11, 5, 6, 1, 10)) {
      val (_, _, _, px) = video.decodeFrame(f)
      (0 until w * h).foreach { i =>
        assert((px(i * 3) & 0xFF) == enc.recon(f).y(i), s"seek frame $f px $i")
      }
    }
    // all-IDR streams carry no stss (every sample is sync) and still work
    val intra = H264Encoder.encodeGray(frames.take(3), w, h,
      H264Encoder.Config(qp = 24))
    val vi = Codec.parseVideo(Artifacts.avcMp4(intra)).asInstanceOf[Codec.Mp4Video]
    val (_, _, _, p2) = vi.decodeFrame(2)
    (0 until w * h).foreach { i =>
      assert((p2(i * 3) & 0xFF) == intra.recon(2).y(i))
    }
  }

  test("multi-track MP4: the walk skips a leading audio trak") {
    val w = 32; val h = 16
    val frames = (0 until 3).map(f => gray(w, h, f))
    val enc = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 24))
    val mp4 = Artifacts.avcMp4(enc)
    // splice a minimal 'mp4a' audio trak BEFORE the video trak inside
    // moov — the track order real muxers use varies
    def be32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
    def find(b: Array[Byte], from: Int, to: Int, typ: String): Int = {
      var p = from
      while (p + 8 <= to) {
        if (new String(b, p + 4, 4, "US-ASCII") == typ) return p
        p += be32(b, p)
      }
      -1
    }
    val moovAt = find(mp4, 0, mp4.length, "moov")
    assert(moovAt >= 0)
    val trakAt = find(mp4, moovAt + 8, moovAt + be32(mp4, moovAt), "trak")
    assert(trakAt >= 0)
    // minimal audio trak: trak > mdia > minf > stbl > stsd('mp4a')
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      val sz = out.length
      out(0) = (sz >> 24).toByte; out(1) = (sz >> 16).toByte
      out(2) = (sz >> 8).toByte; out(3) = sz.toByte
      System.arraycopy(typ.getBytes("US-ASCII"), 0, out, 4, 4)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0, 0, 0, 0, 1) ++
      box("mp4a", new Array[Byte](28)))
    val audioTrak = box("trak", box("mdia", box("minf", box("stbl", stsd))))
    val out = new java.io.ByteArrayOutputStream()
    out.write(mp4, 0, trakAt)
    out.write(audioTrak)
    out.write(mp4, trakAt, mp4.length - trakAt)
    val spliced = out.toByteArray
    // fix moov's size to cover the inserted trak
    val sz = be32(spliced, moovAt) + audioTrak.length
    spliced(moovAt) = (sz >> 24).toByte; spliced(moovAt + 1) = (sz >> 16).toByte
    spliced(moovAt + 2) = (sz >> 8).toByte; spliced(moovAt + 3) = sz.toByte
    val video = Codec.parseVideo(spliced)
    assert(video.frameCount == 3)
    val (_, _, _, px) = video.decodeFrame(1)
    (0 until w * h).foreach { i =>
      assert((px(i * 3) & 0xFF) == enc.recon(1).y(i), s"px $i")
    }
    // a file with ONLY unsupported tracks names them in the refusal
    val onlyAudio = {
      val o = new java.io.ByteArrayOutputStream()
      val ftypAt = find(mp4, 0, mp4.length, "ftyp")
      o.write(mp4, ftypAt, be32(mp4, ftypAt))
      o.write(box("moov", audioTrak))
      o.toByteArray
    }
    val e = intercept[IllegalArgumentException](Codec.parseVideo(onlyAudio))
    assert(e.getMessage.contains("mp4a"))
  }

  test("lossy decode stays within the quantizer envelope") {
    val w = 48; val h = 32
    for (qp <- Seq(20, 30, 40)) {
      val src = gray(w, h, qp)
      val enc = H264Encoder.encodeGray(Seq(src), w, h, H264Encoder.Config(qp = qp))
      val (_, _, _, px) = Codec.parseVideo(Artifacts.avcMp4(enc)).decodeFrame(0)
      val maxErr = (0 until w * h).map(i => math.abs((px(i * 3) & 0xFF) - (src(i) & 0xFF))).max
      // step 0.625·2^(qp/6); envelope leaves headroom for deblock + DC
      val bound = math.max(4, (1 << (qp / 6)) * 4)
      assert(maxErr <= bound, s"qp=$qp maxErr=$maxErr bound=$bound")
    }
  }

  test("avcC SPS/PPS survive the extension-box walk (parse equality)") {
    val enc = H264Encoder.encodeGray(Seq(gray(16, 16, 3)), 16, 16)
    val video = Codec.parseVideo(Artifacts.avcMp4(enc)).asInstanceOf[Codec.Mp4Video]
    val direct = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val (dw, dh, _, _) = video.decodeFrame(0)
    assert((dw, dh) == (direct.width, direct.height))
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
}
