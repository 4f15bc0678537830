package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

/** H.264 codec pins across the full supported subset.
  *
  * Layers, from spec-derived (no shared code with the decoder) upward:
  *  1. structural table validation — every CAVLC table is a complete
  *     prefix-free code, spot values pinned to the standard's printed
  *     codewords;
  *  2. transform/weighting identities — the inverse 4×4 against a
  *     direct matrix evaluation of the normative equations, Hadamard
  *     involution, quant/dequant error bounds, weighted-prediction and
  *     temporal-direct arithmetic on hand-derived vectors;
  *  3. bit-level round-trips — Exp-Golomb, CAVLC blocks across all nC
  *     regimes (encoder and decoder share the tables, so layer 1 is
  *     what keeps this from being tautological);
  *  4. full encode→decode: decoder output must equal the encoder's own
  *     reconstruction BIT-EXACTLY (the conformance contract) across
  *     IDR-only / IPPP / IBPBP streams, multi-slice + ASO framings,
  *     weighted prediction (explicit + implicit), long-term references
  *     with every MMCO, POC types 0/1, both direct modes; PSNR vs the
  *     source bounded, I_PCM lossless, cropping, deblocking on/off,
  *     Annex-B and AVCC framings;
  *  5. fail-fast: CABAC, High-profile SPS, SP/SI, FMO slice groups are
  *     refused by name.
  */
class H264Spec extends AnyFunSuite {

  // ------------------------------------------------------------ layer 1

  test("every CAVLC table is prefix-free and complete") {
    def checkPrefixFree(name: String, codes: Seq[(Int, Int)]): Unit = {
      // (len, bits): no codeword may be a prefix of another
      for (a <- codes; b <- codes if a != b) {
        val (al, ab) = a; val (bl, bb) = b
        if (al <= bl)
          assert(ab != (bb >> (bl - al)), s"$name: ${a} is a prefix of ${b}")
      }
      assert(codes.distinct.size == codes.size, s"$name: duplicate codeword")
    }
    for ((name, t) <- CavlcTables.coeffTokenTables) {
      val codes = for {
        t1 <- 0 until 4; tc <- 0 until 17
        c = t(t1)(tc) if c != null
      } yield (c.len, c.bits)
      val maxTc = if (name == "chromaDC") 4 else 16
      val expected = (0 to maxTc).map(tc => math.min(tc, 3) + 1).sum
      assert(codes.size == expected, s"$name entry count")
      checkPrefixFree(s"coeff_token $name", codes)
      assert(codes.forall(_._1 <= 16), s"$name length cap")
    }
    CavlcTables.totalZeros4x4.zipWithIndex.foreach { case (row, i) =>
      assert(row.length == 16 - i, s"total_zeros row ${i + 1} arity")
      checkPrefixFree(s"total_zeros tc=${i + 1}", row.map(c => (c.len, c.bits)).toSeq)
    }
    CavlcTables.totalZerosChromaDc.zipWithIndex.foreach { case (row, i) =>
      assert(row.length == 4 - i)
      checkPrefixFree(s"cdc total_zeros tc=${i + 1}", row.map(c => (c.len, c.bits)).toSeq)
    }
    CavlcTables.runBefore.zipWithIndex.foreach { case (row, i) =>
      checkPrefixFree(s"run_before zl=${i + 1}", row.map(c => (c.len, c.bits)).toSeq)
    }
  }

  test("coeff_token spot values match the standard's printed codewords") {
    // Table 9-5, 0 ≤ nC < 2 column
    def c0(t1: Int, tc: Int) = CavlcTables.coeffToken0(t1)(tc)
    assert((c0(0, 0).len, c0(0, 0).bits) == (1, 1)) // '1'
    assert((c0(1, 1).len, c0(1, 1).bits) == (2, 1)) // '01'
    assert((c0(2, 2).len, c0(2, 2).bits) == (3, 1)) // '001'
    assert((c0(3, 3).len, c0(3, 3).bits) == (5, 3)) // '00011'
    assert((c0(0, 16).len, c0(0, 16).bits) == (16, 4))
    // 2 ≤ nC < 4: '11' for (0,0), '10' for (1,1)
    def c2(t1: Int, tc: Int) = CavlcTables.coeffToken2(t1)(tc)
    assert((c2(0, 0).len, c2(0, 0).bits) == (2, 3))
    assert((c2(1, 1).len, c2(1, 1).bits) == (2, 2))
    // 4 ≤ nC < 8: fixed 4-bit-ish start '1111' for (0,0)
    def c4(t1: Int, tc: Int) = CavlcTables.coeffToken4(t1)(tc)
    assert((c4(0, 0).len, c4(0, 0).bits) == (4, 15))
    // chroma DC: (1,1) is the single bit '1'
    def cc(t1: Int, tc: Int) = CavlcTables.coeffTokenChromaDc(t1)(tc)
    assert((cc(1, 1).len, cc(1, 1).bits) == (1, 1))
    assert((cc(3, 4).len, cc(3, 4).bits) == (7, 0)) // '0000000'
    // total_zeros tc=1: tz=0 → '1', tz=15 → '000000001'
    val tz1 = CavlcTables.totalZeros4x4(0)
    assert((tz1(0).len, tz1(0).bits) == (1, 1))
    assert((tz1(15).len, tz1(15).bits) == (9, 1))
    // run_before zl>6: run 6 → '001', run 14 → '00000000001'
    val rb7 = CavlcTables.runBefore(6)
    assert((rb7(6).len, rb7(6).bits) == (3, 1))
    assert((rb7(14).len, rb7(14).bits) == (11, 1))
  }

  // ------------------------------------------------------------ layer 2

  /** Direct (unoptimized) evaluation of the normative inverse-transform
    * equations (8-338..8-346), written independently of the butterfly in
    * Transform.inverse4x4.
    */
  private def inverseDirect(d: Array[Int]): Array[Int] = {
    // >>1 in the standard is a FLOOR shift — floorDiv, not truncating /
    def h(v: Int) = Math.floorDiv(v, 2)
    val e = new Array[Int](16)
    for (i <- 0 until 4) {
      val r = Array(d(i * 4), d(i * 4 + 1), d(i * 4 + 2), d(i * 4 + 3))
      e(i * 4 + 0) = r(0) + r(2) + r(1) + h(r(3))
      e(i * 4 + 1) = r(0) - r(2) + h(r(1)) - r(3)
      e(i * 4 + 2) = r(0) - r(2) - h(r(1)) + r(3)
      e(i * 4 + 3) = r(0) + r(2) - r(1) - h(r(3))
    }
    val out = new Array[Int](16)
    for (j <- 0 until 4) {
      val cA = Array(e(j), e(4 + j), e(8 + j), e(12 + j))
      val f0 = cA(0) + cA(2) + cA(1) + h(cA(3))
      val f1 = cA(0) - cA(2) + h(cA(1)) - cA(3)
      val f2 = cA(0) - cA(2) - h(cA(1)) + cA(3)
      val f3 = cA(0) + cA(2) - cA(1) - h(cA(3))
      out(j) = (f0 + 32) >> 6
      out(4 + j) = (f1 + 32) >> 6
      out(8 + j) = (f2 + 32) >> 6
      out(12 + j) = (f3 + 32) >> 6
    }
    out
  }

  test("inverse 4x4 butterfly equals direct normative equations") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val d = Array.fill(16)(rnd.nextInt(2048) - 1024)
      assert(Transform.inverse4x4(d).toSeq == inverseDirect(d).toSeq)
    }
  }

  test("hadamard is self-inverse up to the 1/16 scale") {
    val rnd = new scala.util.Random(11)
    (0 until 100).foreach { _ =>
      val d = Array.fill(16)(rnd.nextInt(512) - 256)
      val back = Transform.hadamard4x4(Transform.hadamard4x4(d))
      assert(back.toSeq == d.map(_ * 16).toSeq)
    }
  }

  test("quant→dequant→inverse reconstructs residual within QP step bound") {
    val rnd = new scala.util.Random(13)
    for (qp <- Seq(0, 10, 20, 28, 36, 44, 51)) {
      var worst = 0
      (0 until 100).foreach { _ =>
        val res = Array.fill(16)(rnd.nextInt(511) - 255)
        val w = Transform.forward4x4(res)
        val q = Transform.quant4x4(w, qp, skipDc = false)
        val r2 = Transform.inverse4x4(Transform.dequant4x4(q, qp, skipDc = false))
        worst = math.max(worst, res.zip(r2).map { case (a, b) => math.abs(a - b) }.max)
      }
      // quantization step doubles every 6 QP; bound is loose but must scale
      val bound = math.max(2, (1 << (qp / 6)) * 2)
      assert(worst <= bound, s"qp=$qp worst=$worst bound=$bound")
    }
  }

  test("chroma QP mapping pins Table 8-15 anchors") {
    assert(Transform.chromaQp(0, 0) == 0)
    assert(Transform.chromaQp(29, 0) == 29)
    assert(Transform.chromaQp(30, 0) == 29)
    assert(Transform.chromaQp(40, 0) == 36)
    assert(Transform.chromaQp(51, 0) == 39)
  }

  // ------------------------------------------------------------ layer 3

  test("exp-golomb round-trip, ue and se") {
    val bw = new BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 254, 255, 1023, 65535)
    val ses = Seq(0, 1, -1, 2, -2, 26, -26, 127, -128)
    ues.foreach(bw.ue)
    ses.foreach(bw.se)
    bw.rbspTrailing()
    val br = new BitReader(bw.toBytes)
    ues.foreach(v => assert(br.ue() == v))
    ses.foreach(v => assert(br.se() == v))
  }

  test("emulation-prevention escape round-trips and strips 00 00 03") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 0, 1), Array[Byte](0, 0, 1, 0, 0, 2),
      Array[Byte](0, 0, 3, 0, 0, 0), Array[Byte](1, 2, 3, 4))
    payloads.foreach { p =>
      val esc = Nal.escape(p)
      // escaped stream must contain no raw 00 00 0x (x ≤ 2) sequence
      // (00 00 03 IS legal — it is the escape itself)
      (0 until esc.length - 2).foreach { i =>
        assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xFF) <= 2))
      }
      assert(Nal.unescape(esc, 0, esc.length).toSeq == p.toSeq)
    }
  }

  test("CAVLC block round-trip across nC regimes and densities") {
    val rnd = new scala.util.Random(17)
    for {
      nC <- Seq(-1, 0, 1, 2, 3, 4, 7, 8, 16)
      maxCoeff <- if (nC == -1) Seq(4) else Seq(15, 16)
      density <- Seq(0.0, 0.1, 0.3, 0.7, 1.0)
      trial <- 0 until 30
    } {
      val coeffs = Array.tabulate(maxCoeff) { _ =>
        if (rnd.nextDouble() < density) {
          val mag = rnd.nextInt(3) match {
            case 0 => 1 + rnd.nextInt(2)
            case 1 => 1 + rnd.nextInt(30)
            case _ => 1 + rnd.nextInt(4000)
          }
          if (rnd.nextBoolean()) mag else -mag
        } else 0
      }
      val bw = new BitWriter
      val tc = Cavlc.encodeBlock(bw, coeffs, nC)
      bw.rbspTrailing()
      val blk = Cavlc.decodeBlock(new BitReader(bw.toBytes), nC, maxCoeff)
      assert(blk.coeffs.toSeq == coeffs.toSeq,
        s"nC=$nC density=$density trial=$trial: ${coeffs.toSeq} != ${blk.coeffs.toSeq}")
      assert(blk.totalCoeff == tc)
      assert(tc == coeffs.count(_ != 0))
    }
  }

  test("CAVLC wide-level escape range round-trips") {
    // |levels| up to 2^15: exercises level_prefix >= 15 escapes
    val bw = new BitWriter
    val coeffs = Array(30000, -20000, 500, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    Cavlc.encodeBlock(bw, coeffs, 0)
    bw.rbspTrailing()
    val blk = Cavlc.decodeBlock(new BitReader(bw.toBytes), 0, 16)
    assert(blk.coeffs.toSeq == coeffs.toSeq)
  }

  // ------------------------------------------------------------ layer 4

  private def synthFrame(w: Int, h: Int, seed: Int, smooth: Boolean): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (smooth) ((x * 3 + y * 5 + seed * 7) % 256).toByte
      else rnd.nextInt(256).toByte
    }
  }

  private def psnr(a: Array[Byte], b: Array[Int]): Double = {
    val mse = a.indices.map { i =>
      val d = (a(i) & 0xFF) - b(i); d.toDouble * d
    }.sum / a.length
    if (mse == 0) 99.0 else 10 * math.log10(255.0 * 255.0 / mse)
  }

  test("encode→decode: decoder equals encoder reconstruction bit-exactly") {
    for {
      (w, h) <- Seq((16, 16), (32, 16), (48, 32), (30, 22), (18, 10))
      qp <- Seq(20, 28, 36)
      smooth <- Seq(true, false)
    } {
      val frames = (0 until 3).map(f => synthFrame(w, h, f * 31 + qp, smooth))
      val enc = H264Encoder.encodeGray(frames, w, h,
        H264Encoder.Config(qp = qp, deblock = false))
      val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
      val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
      assert(sps.width == w && sps.height == h)
      enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((sample, recon), fi) =>
        val dec = H264Decoder.decodeAvccSample(sample, 4, sps, pps)
        assert(dec.width == w && dec.height == h)
        assert(dec.y.toSeq == recon.y.toSeq, s"${w}x$h qp=$qp f=$fi luma recon mismatch")
        assert(dec.cb.toSeq == recon.cb.toSeq, "cb")
        assert(dec.cr.toSeq == recon.cr.toSeq, "cr")
        // decoded luma must actually resemble the source
        val p = psnr(frames(fi), dec.y)
        // quantization error grows ~6 dB per 6 QP; anchors are loose
        val bound = (if (smooth) 44.0 else 30.0) - 0.6 * qp
        assert(p > bound, s"${w}x$h qp=$qp smooth=$smooth PSNR=$p")
      }
    }
  }

  test("deblocking path: recon equality holds and smooths block edges") {
    val w = 48; val h = 32
    val frames = Seq(synthFrame(w, h, 5, smooth = false))
    val on = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 40, deblock = true))
    val off = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 40, deblock = false))
    val sps = H264Decoder.parseSps(Nal.unescape(on.sps, 1, on.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(on.pps, 1, on.pps.length))
    val dOn = H264Decoder.decodeAvccSample(on.samples.head, 4, sps, pps)
    val dOff = H264Decoder.decodeAvccSample(off.samples.head, 4, sps, pps)
    assert(dOn.y.toSeq == on.recon.head.y.toSeq, "deblocked recon equality")
    assert(dOff.y.toSeq == off.recon.head.y.toSeq)
    assert(dOn.y.toSeq != dOff.y.toSeq, "deblocking must change high-QP output")
    // total variation across 16-aligned column edges must not increase
    def edgeTv(p: Array[Int]): Long =
      (0 until h).flatMap(y => Seq(16, 32).map(x =>
        math.abs(p(y * w + x) - p(y * w + x - 1)).toLong)).sum
    assert(edgeTv(dOn.y) <= edgeTv(dOff.y), "deblock reduces MB-edge variation")
  }

  test("I_PCM is lossless end-to-end") {
    val w = 32; val h = 16
    val frames = (0 until 2).map(f => synthFrame(w, h, f + 77, smooth = false))
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 28, pcmEvery = 1, deblock = false))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    enc.samples.zipWithIndex.foreach { case (sample, fi) =>
      val dec = H264Decoder.decodeAvccSample(sample, 4, sps, pps)
      assert(dec.y.toSeq == frames(fi).map(_ & 0xFF).toSeq, "PCM luma exact")
      assert(dec.cb.forall(_ == 128) && dec.cr.forall(_ == 128))
    }
  }

  test("mixed PCM / coded MBs interleave correctly (PCM nC context = 16)") {
    val w = 48; val h = 48
    val frames = Seq(synthFrame(w, h, 3, smooth = false))
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 24, pcmEvery = 3, deblock = true))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    val dec = H264Decoder.decodeAvccSample(enc.samples.head, 4, sps, pps)
    assert(dec.y.toSeq == enc.recon.head.y.toSeq)
  }

  test("Annex-B framing decodes the same frames") {
    val w = 32; val h = 32
    val frames = (0 until 2).map(f => synthFrame(w, h, f, smooth = true))
    val enc = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 26))
    val decoded = H264Decoder.decodeAnnexB(H264Encoder.annexB(enc))
    assert(decoded.size == 2)
    decoded.zip(enc.recon).foreach { case (d, r) =>
      assert(d.y.toSeq == r.y.toSeq)
    }
  }

  test("SEI and AUD NALs inside an AVCC sample are skipped, not misread") {
    val w = 16; val h = 16
    val frames = Seq(synthFrame(w, h, 4, smooth = true))
    val enc = H264Encoder.encodeGray(frames, w, h, H264Encoder.Config(qp = 26))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    // prepend an AUD (type 9) and an SEI (type 6) to the sample, the way
    // real muxers interleave access-unit metadata
    val aud = Nal.unit(0, 9, Array[Byte](0x10.toByte, 0x80.toByte))
    val sei = Nal.unit(0, 6, Array[Byte](5, 4, 1, 2, 3, 4, 0x80.toByte))
    val out = new java.io.ByteArrayOutputStream()
    def put(nal: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, (nal.length >> 8).toByte, nal.length.toByte))
      out.write(nal)
    }
    put(aud); put(sei)
    out.write(enc.samples.head) // already length-prefixed
    val dec = H264Decoder.decodeAvccSample(out.toByteArray, 4, sps, pps)
    assert(dec.y.toSeq == enc.recon.head.y.toSeq)
  }

  test("Annex-B with 3-byte start codes decodes identically") {
    val w = 16; val h = 16
    val enc = H264Encoder.encodeGray(
      Seq(synthFrame(w, h, 8, smooth = false)), w, h, H264Encoder.Config(qp = 24))
    val out = new java.io.ByteArrayOutputStream()
    def put(nal: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 1)); out.write(nal)
    }
    put(enc.sps); put(enc.pps)
    put(enc.samples.head.drop(4))
    val frames = H264Decoder.decodeAnnexB(out.toByteArray)
    assert(frames.size == 1)
    assert(frames.head.y.toSeq == enc.recon.head.y.toSeq)
  }

  // ------------------------------------------------------------ layer 5

  test("fail-fast: CABAC, High profile, P slice, FMO named errors") {
    // an unknown profile (88 = Scalable High, outside the subset)
    val foreign = {
      val bw = new BitWriter
      bw.putBits(88, 8); bw.putBits(0, 8); bw.putBits(40, 8); bw.ue(0)
      bw.rbspTrailing(); bw.toBytes
    }
    val e1 = intercept[IllegalArgumentException](H264Decoder.parseSps(foreign))
    assert(e1.getMessage.contains("profile_idc 88"))

    // CABAC PPS
    val cabac = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(0); bw.put(1) // entropy_coding_mode = CABAC
      bw.put(0); bw.ue(0); bw.ue(0); bw.ue(0); bw.put(0); bw.putBits(0, 2)
      bw.se(0); bw.se(0); bw.se(0); bw.put(0); bw.put(0); bw.put(0)
      bw.rbspTrailing(); bw.toBytes
    }
    val e2 = intercept[IllegalArgumentException](H264Decoder.parsePps(cabac))
    assert(e2.getMessage.contains("CABAC"))

    // FMO PPS
    val fmo = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(0); bw.put(0); bw.put(0); bw.ue(1) // 2 slice groups
      bw.rbspTrailing(); bw.toBytes
    }
    val e3 = intercept[IllegalArgumentException](H264Decoder.parsePps(fmo))
    assert(e3.getMessage.contains("FMO"))

    val enc = H264Encoder.encodeGray(Seq(synthFrame(16, 16, 1, smooth = true)), 16, 16)
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    def avccOf(nal: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](4 + nal.length)
      out(3) = nal.length.toByte
      System.arraycopy(nal, 0, out, 4, nal.length)
      out
    }
    // B slice without any reference pictures (empty DPB)
    val bSlice = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(1) // first_mb, slice_type 1 = B
      bw.ue(0) // pps_id
      bw.putBits(0, 8) // frame_num (the POC pre-parse reads this far)
      bw.rbspTrailing()
      avccOf(Nal.unit(3, 1, bw.toBytes))
    }
    val e4 = intercept[IllegalArgumentException](
      H264Decoder.decodeAvccSample(bSlice, 4, sps, pps))
    assert(e4.getMessage.contains("reference"))
    // SP slice — outside the subset
    val spSlice = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(3) // slice_type 3 = SP
      bw.ue(0); bw.putBits(0, 8) // pps_id, frame_num
      bw.rbspTrailing()
      avccOf(Nal.unit(3, 1, bw.toBytes))
    }
    val e6 = intercept[IllegalArgumentException](
      H264Decoder.decodeAvccSample(spSlice, 4, sps, pps))
    assert(e6.getMessage.contains("slice_type"))
    // P slice without any reference picture (session has an empty DPB)
    val pSlice = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(0) // slice_type 0 = P
      bw.ue(0); bw.putBits(0, 8) // pps_id, frame_num
      bw.rbspTrailing()
      avccOf(Nal.unit(3, 1, bw.toBytes))
    }
    val e5 = intercept[IllegalArgumentException](
      H264Decoder.decodeAvccSample(pSlice, 4, sps, pps))
    assert(e5.getMessage.contains("reference"))
  }

  // ------------------------------------------------------------ inter

  test("IPPP: decoder equals encoder reconstruction bit-exactly across frames") {
    for {
      (w, h) <- Seq((48, 32), (32, 16), (30, 22))
      qp <- Seq(22, 30)
    } {
      // slowly-moving content: base gradient shifted per frame + noise
      val rnd = new scala.util.Random(w * 100 + qp)
      val noise = Array.fill(w * h)(rnd.nextInt(32))
      val frames = (0 until 6).map { f =>
        Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          (((x + f) * 3 + (y + f / 2) * 5 + noise(i)) % 256).toByte
        }
      }
      val enc = H264Encoder.encodeGray(frames, w, h,
        H264Encoder.Config(qp = qp, pFrames = true))
      assert(enc.sampleIsIdr == Seq(true, false, false, false, false, false))
      val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
      val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
      val session = new H264Decoder.Session(sps, pps)
      enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((sample, recon), fi) =>
        val dec = session.decodeSample(sample, 4)
        assert(dec.y.toSeq == recon.y.toSeq, s"${w}x$h qp=$qp frame $fi luma")
        assert(dec.cb.toSeq == recon.cb.toSeq, s"frame $fi cb")
        assert(dec.cr.toSeq == recon.cr.toSeq, s"frame $fi cr")
        val p = psnr(frames(fi), dec.y)
        assert(p > 40.0 - 0.6 * qp, s"${w}x$h qp=$qp frame $fi PSNR=$p")
      }
    }
  }

  test("IPPP compresses: P frames are smaller than intra coding of same content") {
    val w = 48; val h = 48
    // static background with a small moving square — heavy skip coverage
    val frames = (0 until 5).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        if (x >= 8 + 4 * f && x < 16 + 4 * f && y >= 20 && y < 28) 200.toByte
        else ((x * 2 + y * 3) % 200).toByte
      }
    }
    val ip = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, pFrames = true))
    val intra = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, pFrames = false))
    val pBytes = ip.samples.drop(1).map(_.length).sum
    val iBytes = intra.samples.drop(1).map(_.length).sum
    assert(pBytes * 3 < iBytes,
      s"P frames $pBytes B vs intra $iBytes B — motion compensation must pay")
    // and they still decode exactly
    val sps = H264Decoder.parseSps(Nal.unescape(ip.sps, 1, ip.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(ip.pps, 1, ip.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    ip.samples.zip(ip.recon).foreach { case (s, r) =>
      assert(session.decodeSample(s, 4).y.toSeq == r.y.toSeq)
    }
  }

  test("ref list modification: the reordering commands are emitted and honored") {
    val w = 32; val h = 32
    val frames = (0 until 5).map { f =>
      Array.tabulate(w * h)(i => (((i % w) * 7 + (i / w) * 11 + f * 13) % 256).toByte)
    }
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, pFrames = true))
    // sample with frame_num 3 (the 4th) must carry the modification flag
    val sample = enc.samples(3)
    val nal = sample.drop(4)
    assert((nal(0) & 0x1F) == 1, "non-IDR slice")
    val br = new BitReader(Nal.unescape(nal, 1, nal.length))
    assert(br.ue() == 0) // first_mb_in_slice
    assert(br.ue() == 5) // slice_type P
    assert(br.ue() == 0) // pps_id
    assert(br.u(8) == 3) // frame_num
    assert(br.u1() == 1) // num_ref_idx override
    assert(br.ue() + 1 == 2) // two active refs
    assert(br.u1() == 1, "ref_pic_list_modification_flag_l0 must be set")
    // and the whole stream still decodes bit-exactly (a decoder ignoring
    // or mis-applying the reorder would diverge from this frame on)
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      assert(session.decodeSample(s, 4).y.toSeq == r.y.toSeq, s"frame $fi")
    }
  }

  // ------------------------------------------------------- multi-slice

  test("multi-slice intra picture: one NAL per MB row, bit-exact decode") {
    val w = 48; val h = 48
    val frames = Seq(synthFrame(w, h, 21, smooth = false))
    val multi = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, sliceRows = 1))
    val single = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26))
    val sps = H264Decoder.parseSps(Nal.unescape(multi.sps, 1, multi.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(multi.pps, 1, multi.pps.length))
    // the sample must carry 3 slice NALs with first_mb 0, 3, 6 — one per row
    val s = multi.samples.head
    var pos = 0
    val firstMbs = Seq.newBuilder[Int]
    while (pos + 4 <= s.length) {
      val len = ((s(pos) & 0xFF) << 24) | ((s(pos + 1) & 0xFF) << 16) |
        ((s(pos + 2) & 0xFF) << 8) | (s(pos + 3) & 0xFF)
      assert((s(pos + 4) & 0x1F) == 5, "IDR slice NAL")
      firstMbs += new BitReader(Nal.unescape(s, pos + 5, pos + 4 + len)).ue()
      pos += 4 + len
    }
    assert(firstMbs.result() == Seq(0, 3, 6))
    val dec = H264Decoder.decodeAvccSample(s, 4, sps, pps)
    assert(dec.y.toSeq == multi.recon.head.y.toSeq, "multi-slice luma")
    assert(dec.cb.toSeq == multi.recon.head.cb.toSeq)
    // slice boundaries cut intra prediction: the multi-slice recon must
    // genuinely differ from the single-slice one (same source, same QP)
    assert(multi.recon.head.y.toSeq != single.recon.head.y.toSeq,
      "slice-masked prediction must change the reconstruction")
    // and both resemble the source
    assert(psnr(frames.head, dec.y) > 30.0 - 0.6 * 26)
  }

  test("multi-slice IPPP: slice-masked MV prediction and per-slice skip runs") {
    val w = 64; val h = 48
    val rnd = new scala.util.Random(99)
    val noise = Array.fill(w * h)(rnd.nextInt(24))
    val frames = (0 until 5).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x + 2 * f) * 3 + y * 5 + noise(i)) % 256).toByte
      }
    }
    for (rows <- Seq(1, 2)) {
      val enc = H264Encoder.encodeGray(frames, w, h,
        H264Encoder.Config(qp = 28, pFrames = true, sliceRows = rows))
      val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
      val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
      val session = new H264Decoder.Session(sps, pps)
      enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((sample, recon), fi) =>
        val dec = session.decodeSample(sample, 4)
        assert(dec.y.toSeq == recon.y.toSeq, s"rows=$rows frame $fi luma")
        assert(dec.cb.toSeq == recon.cb.toSeq, s"rows=$rows frame $fi cb")
        assert(dec.cr.toSeq == recon.cr.toSeq, s"rows=$rows frame $fi cr")
      }
    }
  }

  test("disable_deblocking_filter_idc 2: slice-boundary edges unfiltered") {
    val w = 48; val h = 48
    // gentle gradient + mild noise: the filter's alpha/beta thresholds
    // pass at the quantized MB edges (pure noise rejects nearly all)
    val rnd = new scala.util.Random(31)
    val frames = Seq(Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 2 + y * 2 + rnd.nextInt(16)) % 256).toByte
    })
    val idc2 = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 32, sliceRows = 1, noSliceEdgeDeblock = true))
    val idc0 = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 32, sliceRows = 1))
    val sps = H264Decoder.parseSps(Nal.unescape(idc2.sps, 1, idc2.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(idc2.pps, 1, idc2.pps.length))
    val d2 = H264Decoder.decodeAvccSample(idc2.samples.head, 4, sps, pps)
    val d0 = H264Decoder.decodeAvccSample(idc0.samples.head, 4, sps, pps)
    assert(d2.y.toSeq == idc2.recon.head.y.toSeq, "idc2 recon equality")
    assert(d0.y.toSeq == idc0.recon.head.y.toSeq, "idc0 recon equality")
    // identical coding up to the filter: only slice-boundary rows differ
    assert(d2.y.toSeq != d0.y.toSeq, "boundary filtering must matter")
    // rows away from the 16-aligned slice boundaries are identical (the
    // luma strong filter reaches ±3 samples; in-place cascade through
    // the next internal edge bounds the spill under row 16+5)
    for (y <- (0 to 11) ++ (23 to 26) ++ (40 to 47); x <- 0 until w)
      assert(d2.y(y * w + x) == d0.y(y * w + x), s"interior row $y x=$x")
  }

  test("multi-slice Annex-B: pictures group at first_mb 0 boundaries") {
    val w = 32; val h = 48
    val frames = (0 until 3).map(f => synthFrame(w, h, f + 61, smooth = true))
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, pFrames = true, sliceRows = 1))
    val decoded = H264Decoder.decodeAnnexB(H264Encoder.annexB(enc))
    assert(decoded.size == 3)
    decoded.zip(enc.recon).zipWithIndex.foreach { case ((d, r), fi) =>
      assert(d.y.toSeq == r.y.toSeq, s"frame $fi")
    }
  }

  test("ASO: out-of-order slices decode identically (slices are independent)") {
    val w = 48; val h = 48
    val enc = H264Encoder.encodeGray(
      Seq(synthFrame(w, h, 7, smooth = false)), w, h,
      H264Encoder.Config(qp = 26, sliceRows = 1))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    // split the sample into NALs and rotate the slice order
    val s = enc.samples.head
    val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos + 4 <= s.length) {
      val len = ((s(pos) & 0xFF) << 24) | ((s(pos + 1) & 0xFF) << 16) |
        ((s(pos + 2) & 0xFF) << 8) | (s(pos + 3) & 0xFF)
      nals += java.util.Arrays.copyOfRange(s, pos, pos + 4 + len)
      pos += 4 + len
    }
    assert(nals.size == 3, "48x48 with 1-row slices = 3 slices")
    for (order <- Seq(Seq(2, 0, 1), Seq(1, 2, 0), Seq(2, 1, 0))) {
      val shuffled = order.flatMap(nals(_)).toArray
      val d = H264Decoder.decodeAvccSample(shuffled, 4, sps, pps)
      assert(d.y.toSeq == enc.recon.head.y.toSeq, s"order $order luma")
      assert(d.cb.toSeq == enc.recon.head.cb.toSeq, s"order $order cb")
    }
    // a GAP (missing slice) still fails fast by name
    val gap = Seq(nals(0), nals(2)).flatten.toArray
    val e = intercept[IllegalArgumentException](
      H264Decoder.decodeAvccSample(gap, 4, sps, pps))
    assert(e.getMessage.contains("gap") || e.getMessage.contains("covered"))
  }

  // --------------------------------------------------------- B slices

  private def movingFrames(w: Int, h: Int, n: Int, seed: Int): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    val noise = Array.fill(w * h)(rnd.nextInt(24))
    (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x + 2 * f) * 3 + (y + f) * 5 + noise(i)) % 256).toByte
      }
    }
  }

  test("IBPBP: B slices decode bit-exactly and predict from both directions") {
    for ((w, h) <- Seq((48, 32), (64, 48)); qp <- Seq(24, 30)) {
      val frames = movingFrames(w, h, 9, w + qp)
      val enc = H264Encoder.encodeGray(frames, w, h,
        H264Encoder.Config(qp = qp, bFrames = true))
      // decode order interleaves: I, P(2), B(1), P(4), B(3), …
      assert(enc.display == Seq(0, 2, 1, 4, 3, 6, 5, 8, 7))
      assert(enc.sampleIsIdr == (true +: Seq.fill(8)(false)))
      val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
      val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
      assert(sps.pocType == 0, "B streams carry POC type 0")
      val session = new H264Decoder.Session(sps, pps)
      enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
        // B NALs are non-reference (nal_ref_idc 0)
        val refIdc = (s(4) >> 5) & 3
        val isB = enc.display(fi) % 2 == 1
        assert((refIdc == 0) == isB, s"sample $fi nal_ref_idc $refIdc")
        val dec = session.decodeSample(s, 4)
        assert(dec.y.toSeq == r.y.toSeq, s"${w}x$h qp=$qp sample $fi luma")
        assert(dec.cb.toSeq == r.cb.toSeq, s"sample $fi cb")
        assert(dec.cr.toSeq == r.cr.toSeq, s"sample $fi cr")
        val p = psnr(frames(enc.display(fi)), dec.y)
        assert(p > 40.0 - 0.6 * qp, s"sample $fi PSNR=$p")
      }
      // bidirectional prediction must pay: B samples smaller than P ones
      val pBytes = enc.samples.zipWithIndex.collect {
        case (s, i) if !enc.sampleIsIdr(i) && enc.display(i) % 2 == 0 => s.length
      }
      val bBytes = enc.samples.zipWithIndex.collect {
        case (s, i) if enc.display(i) % 2 == 1 => s.length
      }
      assert(bBytes.sum * pBytes.size < pBytes.sum * bBytes.size,
        s"mean B ${bBytes.sum / bBytes.size} !< mean P ${pBytes.sum / pBytes.size}")
    }
  }

  test("B slices compose with multi-slice pictures and deblocking") {
    val w = 64; val h = 48
    val frames = movingFrames(w, h, 7, 3)
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 28, bFrames = true, sliceRows = 1, deblock = true))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val dec = session.decodeSample(s, 4)
      assert(dec.y.toSeq == r.y.toSeq, s"sample $fi luma")
      assert(dec.cb.toSeq == r.cb.toSeq && dec.cr.toSeq == r.cr.toSeq, s"sample $fi chroma")
    }
  }

  test("B via Annex-B: pictures group and decode in coded order") {
    val w = 32; val h = 32
    val frames = movingFrames(w, h, 5, 11)
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true))
    val decoded = H264Decoder.decodeAnnexB(H264Encoder.annexB(enc))
    assert(decoded.size == 5)
    decoded.zip(enc.recon).zipWithIndex.foreach { case ((d, r), fi) =>
      assert(d.y.toSeq == r.y.toSeq, s"picture $fi")
    }
  }

  test("temporal direct mode: POC-scaled co-located motion round-trips") {
    val w = 48; val h = 32
    val frames = movingFrames(w, h, 9, 17)
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true, temporalDirectB = true))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    // the B slice header must carry direct_spatial_mv_pred_flag = 0
    locally {
      val s = enc.samples(2) // first B
      val len = ((s(0) & 0xFF) << 24) | ((s(1) & 0xFF) << 16) |
        ((s(2) & 0xFF) << 8) | (s(3) & 0xFF)
      val br = new BitReader(Nal.unescape(s, 5, 4 + len))
      assert(br.ue() == 0 && br.ue() == 6 && br.ue() == 0) // B slice
      br.u(sps.log2MaxFrameNum)
      br.u(sps.log2MaxPocLsb) // poc lsb
      assert(br.u1() == 0, "temporal direct signalled")
    }
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = session.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"temporal sample $fi luma")
      assert(d.cb.toSeq == r.cb.toSeq, s"temporal sample $fi cb")
      assert(psnr(frames(enc.display(fi)), d.y) > 40.0 - 0.6 * 26,
        s"temporal sample $fi PSNR")
    }
    // temporal and spatial direct genuinely differ on this content
    val sp = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true))
    assert(enc.recon(2).y.toSeq != sp.recon(2).y.toSeq ||
      enc.samples(2).toSeq != sp.samples(2).toSeq,
      "modes must not collapse to the same coding")
  }

  test("temporal direct MV scaling pins the §8.4.1.2.3 arithmetic") {
    // col block at poc 8 referencing poc 0, current B at poc 2:
    // td = 8, tb = 2, tx = (16384+4)/8 = 2048, dsf = (2·2048+32)>>6 = 64
    // mvL0 = (64·mv + 128) >> 8, mvL1 = mvL0 − mv
    val col = (_: Int) => BDirect.ColBlock(42, 0, 16, -8)
    val dm = BDirect.temporal(col,
      picId => if (picId == 42) 0 else -1, _ => 0, _ => false,
      colPicPoc = 8, currPoc = 2, inference8x8 = true)
    assert(dm.ref0.forall(_ == 0) && dm.ref1.forall(_ == 0))
    assert(dm.mv0x(0) == 4 && dm.mv0y(0) == -2)
    assert(dm.mv1x(0) == 4 - 16 && dm.mv1y(0) == -2 + 8)
    // long-term L0 reference: mvCol copies unscaled, L1 gets zero
    val dmLt = BDirect.temporal(col,
      picId => if (picId == 42) 0 else -1, _ => 0, _ => true,
      colPicPoc = 8, currPoc = 2, inference8x8 = true)
    assert(dmLt.mv0x(0) == 16 && dmLt.mv1x(0) == 0)
    // intra co-located block: refIdxL0 = 0 with zero motion
    val dmIntra = BDirect.temporal(_ => BDirect.ColBlock(-1, -1, 0, 0),
      _ => -1, _ => 4, _ => false,
      colPicPoc = 8, currPoc = 2, inference8x8 = true)
    assert(dmIntra.ref0(0) == 0 && dmIntra.mv0x(0) == 0 && dmIntra.mv1x(0) == 0)
  }

  test("POC type 1: the ref-frame cycle orders B lists and implicit weights") {
    val w = 48; val h = 32
    val frames = movingFrames(w, h, 9, 13)
    // implicit weighting makes the derived POC VALUES load-bearing (the
    // weights are POC distances), not just their order — a wrong §8.2.1.2
    // derivation would change pixels, not only list layouts
    val t1 = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true, implicitWeightedB = true,
        pocType1 = true))
    val sps = H264Decoder.parseSps(Nal.unescape(t1.sps, 1, t1.sps.length))
    assert(sps.pocType == 1 && !sps.deltaAlwaysZero &&
      sps.cycleOffsets == IndexedSeq(4) && sps.offsetNonRef == -2)
    val pps = H264Decoder.parsePps(Nal.unescape(t1.pps, 1, t1.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    t1.samples.zip(t1.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = session.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"type-1 sample $fi luma")
      assert(d.cb.toSeq == r.cb.toSeq, s"type-1 sample $fi cb")
    }
    // and the type-1 stream must decode identically to the type-0 coding
    // of the same content (the POC VALUES agree by construction: 2·display)
    val t0 = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, bFrames = true, implicitWeightedB = true))
    t0.recon.zip(t1.recon).zipWithIndex.foreach { case ((a, b), fi) =>
      assert(a.y.toSeq == b.y.toSeq, s"type-0/type-1 recon parity, sample $fi")
    }
  }

  test("High-profile parameter sets: constrained subset parses, rest refused by name") {
    // hand-built High SPS: profile 100, 4:2:0, 8-bit, no scaling lists —
    // what x264 --no-cabac --no-8x8dct signals
    def highSps(chromaFmt: Int, bd: Int, scaling: Int): Array[Byte] = {
      val bw = new BitWriter
      bw.putBits(100, 8); bw.putBits(0, 8); bw.putBits(30, 8) // profile/flags/level
      bw.ue(0) // sps_id
      bw.ue(chromaFmt); bw.ue(bd); bw.ue(bd) // chroma fmt, bit depths −8
      bw.put(0) // qpprime bypass
      bw.put(scaling) // seq_scaling_matrix_present
      bw.ue(4) // log2_max_frame_num −4
      bw.ue(2) // poc type 2
      bw.ue(2) // max refs
      bw.put(0) // gaps
      bw.ue(1); bw.ue(0) // 32x16 in MBs
      bw.put(1); bw.put(1) // frame_mbs_only, direct_8x8
      bw.put(0); bw.put(0) // no crop, no vui
      bw.rbspTrailing(); bw.toBytes
    }
    val sps = H264Decoder.parseSps(highSps(1, 0, 0))
    assert(sps.profileIdc == 100 && sps.width == 32 && sps.height == 16)
    val e1 = intercept[IllegalArgumentException](
      H264Decoder.parseSps(highSps(2, 0, 0)))
    assert(e1.getMessage.contains("chroma_format_idc 2"))
    val e2 = intercept[IllegalArgumentException](
      H264Decoder.parseSps(highSps(1, 2, 0)))
    assert(e2.getMessage.contains("bit_depth_luma 10"))
    val e3 = intercept[IllegalArgumentException](
      H264Decoder.parseSps(highSps(1, 0, 1)))
    assert(e3.getMessage.contains("scaling"))
    // a High-signalled stream whose body is inside the subset decodes:
    // re-wrap a baseline encode under the High SPS (same geometry/POC)
    val enc = H264Encoder.encodeGray(
      (0 until 3).map(f => synthFrame(32, 16, f, smooth = true)), 32, 16,
      H264Encoder.Config(qp = 26, pFrames = true))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      assert(session.decodeSample(s, 4).y.toSeq == r.y.toSeq, s"High sample $fi")
    }
    // PPS extension: transform_8x8_mode refused by name
    val pps8x8 = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(0); bw.put(0); bw.put(0); bw.ue(0); bw.ue(0); bw.ue(0)
      bw.put(0); bw.putBits(0, 2); bw.se(0); bw.se(0); bw.se(0)
      bw.put(0); bw.put(0); bw.put(0)
      bw.put(1) // transform_8x8_mode_flag
      bw.put(0); bw.se(0)
      bw.rbspTrailing(); bw.toBytes
    }
    val e4 = intercept[IllegalArgumentException](H264Decoder.parsePps(pps8x8))
    assert(e4.getMessage.contains("transform_8x8"))
  }

  test("second_chroma_qp_index_offset: per-plane Cr QP round-trips") {
    val w = 32; val h = 32
    val rnd = new scala.util.Random(61)
    // real chroma content so Cb and Cr residuals differ
    val frames = (0 until 4).map { f =>
      (Array.tabulate(w * h) { i => ((i * 3 + f * 17) % 256) },
        Array.tabulate(w * h / 4)(i => (i * 7 + f * 5 + rnd.nextInt(32)) % 256),
        Array.tabulate(w * h / 4)(i => (i * 11 + f * 3 + rnd.nextInt(32)) % 256))
    }
    val enc = H264Encoder.encodeYuv(frames, w, h,
      H264Encoder.Config(qp = 30, pFrames = true, crQpOffset = -4))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    assert(pps.chromaQpOffset == 0 && pps.crQpOffset == -4,
      "PPS extension carries the Cr offset")
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = session.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"cr-offset sample $fi luma")
      assert(d.cb.toSeq == r.cb.toSeq, s"cr-offset sample $fi cb")
      assert(d.cr.toSeq == r.cr.toSeq, s"cr-offset sample $fi cr")
    }
    // the offset genuinely changes the Cr coding (finer quant at −4)
    val flat = H264Encoder.encodeYuv(frames, w, h,
      H264Encoder.Config(qp = 30, pFrames = true))
    assert(enc.samples(1).toSeq != flat.samples(1).toSeq)
  }

  // ------------------------------------- long-term references + MMCO

  test("applyMarking pins the §8.2.5 DPB transitions") {
    import H264Decoder._
    def pic(fn: Int, lt: Boolean = false, idx: Int = -1): DpbPic =
      DpbPic(RefFrame(Array(0), Array(0), Array(0)), fn, fn, 2 * fn,
        PicMotion(Array(0), Array(0), Array(0), Array(0), Array(0), Array(0), Array(0), Array(0)),
        lt, idx)
    // sliding window evicts the oldest SHORT-term, never a long-term
    val d1 = scala.collection.mutable.ArrayBuffer(
      pic(3), pic(2), pic(0, lt = true, idx = 0))
    applyMarking(d1, Marking(adaptive = false), pic(4), 4, 256, 3, 0)
    assert(d1.map(_.frameNum) == Seq(4, 3, 0), "evicted fn=2, kept the long-term")
    // MMCO 1 unmarks by PicNum; 3 converts with idx-dup replacement;
    // 4 trims above the new max; 2 unmarks a long-term
    val d2 = scala.collection.mutable.ArrayBuffer(
      pic(3), pic(2), pic(1, lt = true, idx = 1))
    applyMarking(d2, Marking(adaptive = true, Seq(
      SetMaxLt(2), ShortToLong(1, 1), UnmarkShort(0))), pic(4), 4, 256, 3, 1)
    // fn2 → long idx 1 (replacing the old idx-1 pic), fn3 unmarked
    assert(d2.map(p => (p.frameNum, p.longTerm, p.ltIdx)) ==
      Seq((4, false, -1), (2, true, 1)))
    val d3 = scala.collection.mutable.ArrayBuffer(
      pic(2), pic(1, lt = true, idx = 0))
    applyMarking(d3, Marking(adaptive = true, Seq(UnmarkLong(0))),
      pic(3), 3, 256, 3, 0)
    assert(d3.map(_.frameNum) == Seq(3, 2))
    // MMCO 4 with a shrunken max drops out-of-range long-terms
    val d4 = scala.collection.mutable.ArrayBuffer(
      pic(2, lt = true, idx = 1), pic(1, lt = true, idx = 0))
    applyMarking(d4, Marking(adaptive = true, Seq(SetMaxLt(1))),
      pic(3), 3, 256, 3, 1)
    assert(d4.map(_.frameNum) == Seq(3, 1), "idx 1 > new max 0 dropped")
    // MMCO 6 marks the CURRENT picture long-term
    val d5 = scala.collection.mutable.ArrayBuffer(pic(2))
    applyMarking(d5, Marking(adaptive = true, Seq(SetMaxLt(1), CurrToLong(0))),
      pic(3), 3, 256, 3, -1)
    assert(d5.head.longTerm && d5.head.ltIdx == 0)
  }

  test("long-term anchor stream: MMCO ops and idc-2 reordering round-trip") {
    val w = 48; val h = 32
    val frames = movingFrames(w, h, 15, 5)
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 26, pFrames = true, longTermRefs = true))
    val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
    val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
    // sample 4 (frame_num 4) must carry ADAPTIVE marking with ops 4,3,1
    def sliceBits(fi: Int): BitReader = {
      val s = enc.samples(fi)
      val len = ((s(0) & 0xFF) << 24) | ((s(1) & 0xFF) << 16) |
        ((s(2) & 0xFF) << 8) | (s(3) & 0xFF)
      new BitReader(Nal.unescape(s, 5, 4 + len))
    }
    locally {
      val br = sliceBits(4)
      assert(br.ue() == 0 && br.ue() == 5 && br.ue() == 0) // hdr, P slice
      assert(br.u(8) == 4) // frame_num
      val ovr = br.u1(); if (ovr == 1) br.ue() // num_ref_idx override
      val mod = br.u1() // ref_pic_list_modification_flag_l0
      if (mod == 1) { var idc = br.ue(); while (idc != 3) { br.ue(); idc = br.ue() } }
      assert(br.u1() == 1, "adaptive_ref_pic_marking_mode_flag set")
      assert(br.ue() == 4, "MMCO 4 first") // SetMaxLt
    }
    // sample 7 (frame_num 7, 7%3==1) pulls the long-term with idc 2
    locally {
      val br = sliceBits(7)
      assert(br.ue() == 0 && br.ue() == 5 && br.ue() == 0)
      assert(br.u(8) == 7)
      val ovr = br.u1(); if (ovr == 1) br.ue()
      assert(br.u1() == 1, "ref_pic_list_modification_flag_l0 set")
      assert(br.ue() == 2, "idc 2 long-term reposition")
    }
    // the whole stream decodes bit-exactly through every op
    val session = new H264Decoder.Session(sps, pps)
    enc.samples.zip(enc.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = session.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"sample $fi luma")
      assert(d.cb.toSeq == r.cb.toSeq && d.cr.toSeq == r.cr.toSeq, s"$fi chroma")
      assert(psnr(frames(fi), d.y) > 40.0 - 0.6 * 26, s"sample $fi PSNR")
    }
    // sample 11 must carry MMCO 5 (the soft-IDR reset) and the stream
    // CONTINUES past it: frame 12 predicts from the reset picture, whose
    // frame_num both DPB models rewrote to 0 — already pinned bit-exact
    // by the loop above; here pin the bit itself
    locally {
      val br = sliceBits(11)
      assert(br.ue() == 0 && br.ue() == 5 && br.ue() == 0)
      assert(br.u(8) == 11) // frame_num before the reset
      val ovr = br.u1(); if (ovr == 1) br.ue()
      val mod = br.u1()
      if (mod == 1) { var idc = br.ue(); while (idc != 3) { br.ue(); idc = br.ue() } }
      assert(br.u1() == 1, "adaptive marking")
      assert(br.ue() == 5, "MMCO 5 emitted")
      assert(br.ue() == 0, "end of MMCO list")
    }
    // and the post-reset picture re-starts frame_num at 1
    locally {
      val br = sliceBits(12)
      assert(br.ue() == 0 && br.ue() == 5 && br.ue() == 0)
      assert(br.u(8) == 1, "frame_num restarts after MMCO 5")
    }
  }

  // ------------------------------------------------- weighted prediction

  test("weighting arithmetic pins the normative equations") {
    // single-list: ((p·w + 2^(logWD−1)) >> logWD) + o, clipped
    assert(Weighting.single(100, 64, 0, 6) == 100) // identity weight
    assert(Weighting.single(100, 80, -3, 6) == 122) // (8000+32)>>6 − 3
    assert(Weighting.single(200, 128, 50, 6) == 255) // clips high
    assert(Weighting.single(10, -64, 0, 6) == 0) // clips low
    assert(Weighting.single(7, 3, 1, 0) == 22) // logWD 0: p·w + o
    // bi: ((p0·w0 + p1·w1 + 2^logWD) >> (logWD+1)) + ((o0+o1+1)>>1)
    assert(Weighting.bi(100, 64, 0, 50, 64, 0, 6) == 75) // plain average
    assert(Weighting.bi(100, 32, 0, 50, 32, 0, 5) == 75) // implicit default
    // implicit weights: equidistant B → 32/32; quarter-way → 48/16
    assert(Weighting.implicitWeights(2, 0, 4) == (32, 32))
    assert(Weighting.implicitWeights(2, 0, 8) == (48, 16))
    assert(Weighting.implicitWeights(0, 0, 0) == (32, 32)) // degenerate td
  }

  test("explicit/implicit weighted prediction round-trips bit-exactly") {
    val w = 48; val h = 32
    def fade(n: Int): Seq[Array[Byte]] = (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        math.min(255, ((x * 3 + y * 5) % 200) * (10 + f) / 12).toByte
      }
    }
    // P slices with an explicit pred_weight_table (weighted_pred_flag=1)
    val p = H264Encoder.encodeGray(fade(5), w, h,
      H264Encoder.Config(qp = 26, pFrames = true, weightedPred = true))
    val pps1 = H264Decoder.parsePps(Nal.unescape(p.pps, 1, p.pps.length))
    assert(pps1.weightedPred, "PPS carries weighted_pred_flag")
    val sps1 = H264Decoder.parseSps(Nal.unescape(p.sps, 1, p.sps.length))
    val s1 = new H264Decoder.Session(sps1, pps1)
    p.samples.zip(p.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = s1.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"P-WP sample $fi luma")
      assert(d.cb.toSeq == r.cb.toSeq && d.cr.toSeq == r.cr.toSeq, s"$fi chroma")
      assert(psnr(fade(5)(fi), d.y) > 40.0 - 0.6 * 26, s"P-WP sample $fi PSNR")
    }
    // B slices under implicit-by-POC weighting (idc 2 — the x264 default)
    val bi = H264Encoder.encodeGray(fade(7), w, h,
      H264Encoder.Config(qp = 26, bFrames = true, implicitWeightedB = true))
    val pps2 = H264Decoder.parsePps(Nal.unescape(bi.pps, 1, bi.pps.length))
    assert(pps2.weightedBipredIdc == 2)
    val sps2 = H264Decoder.parseSps(Nal.unescape(bi.sps, 1, bi.sps.length))
    val s2 = new H264Decoder.Session(sps2, pps2)
    bi.samples.zip(bi.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      assert(s2.decodeSample(s, 4).y.toSeq == r.y.toSeq, s"B-implicit sample $fi")
    }
    // B slices under explicit weights on both lists (idc 1)
    val be = H264Encoder.encodeGray(fade(7), w, h,
      H264Encoder.Config(qp = 26, bFrames = true, weightedPred = true))
    val pps3 = H264Decoder.parsePps(Nal.unescape(be.pps, 1, be.pps.length))
    assert(pps3.weightedBipredIdc == 1 && pps3.weightedPred)
    val sps3 = H264Decoder.parseSps(Nal.unescape(be.sps, 1, be.sps.length))
    val s3 = new H264Decoder.Session(sps3, pps3)
    be.samples.zip(be.recon).zipWithIndex.foreach { case ((s, r), fi) =>
      val d = s3.decodeSample(s, 4)
      assert(d.y.toSeq == r.y.toSeq, s"B-explicit sample $fi luma")
      assert(d.cr.toSeq == r.cr.toSeq, s"B-explicit sample $fi cr")
    }
    // the weighted streams must actually differ from unweighted coding
    val plain = H264Encoder.encodeGray(fade(5), w, h,
      H264Encoder.Config(qp = 26, pFrames = true))
    assert(p.samples(1).toSeq != plain.samples(1).toSeq,
      "weighting must change the coded P stream")
  }

  test("IPPP via Annex-B: session decode with multi-ref and deblocking") {
    val w = 64; val h = 32
    val frames = (0 until 5).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x * x + 3 * f * x) / 4 + y * 7 + f) % 256).toByte
      }
    }
    val enc = H264Encoder.encodeGray(frames, w, h,
      H264Encoder.Config(qp = 28, pFrames = true, deblock = true))
    val decoded = H264Decoder.decodeAnnexB(H264Encoder.annexB(enc))
    assert(decoded.size == 5)
    decoded.zip(enc.recon).zipWithIndex.foreach { case ((d, r), fi) =>
      assert(d.y.toSeq == r.y.toSeq, s"frame $fi")
    }
  }
}
