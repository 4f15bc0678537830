package graft.multimodal.h264

/** Pure-JVM H.264 decoder for the BASELINE-INTRA subset (ITU-T H.264,
  * public spec; no code derives from any existing decoder):
  *
  *  - profile_idc 66 (Baseline) / 77-compatible streams that stay inside
  *    the subset; CAVLC entropy coding only (`entropy_coding_mode_flag`=0)
  *  - I/IDR slices, frame_mbs_only, 4:2:0, 8-bit; single slice per frame,
  *    no FMO/ASO; MB types I_4x4, I_16x16 (all 24 variants), I_PCM
  *  - frame cropping honored; deblocking per §8.7 for intra frames
  *
  * Everything outside the subset FAILS FAST with a named error
  * (CABAC, P/B slices, other profiles' SPS extensions, multi-slice-group)
  * rather than misreading — the same stance as the HDF5/szip readers
  * (`graft.sources.Hdf5`). The reference writes MP4 video via imageio
  * (/root/reference/picoprobe/tools/temporal.py:26-35), whose real-world
  * codec is H.264; this decoder is what lets the engine ingest such clips.
  */
object H264Decoder {

  final case class Sps(
      profileIdc: Int, levelIdc: Int, spsId: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      widthMbs: Int, heightMbs: Int,
      cropLeft: Int, cropRight: Int, cropTop: Int, cropBottom: Int) {
    // 4:2:0 frame_mbs_only crop units: 2 horizontally, 2 vertically (§7.4.2.1.1)
    def width: Int = widthMbs * 16 - 2 * (cropLeft + cropRight)
    def height: Int = heightMbs * 16 - 2 * (cropTop + cropBottom)
  }

  final case class Pps(
      ppsId: Int, spsId: Int, picInitQp: Int, chromaQpOffset: Int,
      deblockCtrl: Boolean)

  /** A decoded frame: cropped planes, samples 0..255. */
  final case class Frame(
      width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def chromaWidth: Int = width / 2
    def chromaHeight: Int = height / 2
  }

  // mapped-Exp-Golomb coded_block_pattern, intra, 4:2:0 (Table 9-4)
  private[h264] val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private[h264] val CbpIntraInv: Array[Int] = {
    val inv = new Array[Int](48)
    CbpIntra.zipWithIndex.foreach { case (cbp, code) => inv(cbp) = code }
    inv
  }

  /** luma4x4BlkIdx → (x4, y4) within the MB, §6.4.3 inverse scan. */
  private[h264] def blkX(idx: Int): Int = ((idx >> 2) & 1) * 2 + (idx & 1)
  private[h264] def blkY(idx: Int): Int = ((idx >> 2) >> 1) * 2 + ((idx >> 1) & 1)

  def parseSps(rbsp: Array[Byte]): Sps = {
    val br = new BitReader(rbsp)
    val profile = br.u(8)
    br.u(8) // constraint flags + reserved
    val level = br.u(8)
    val spsId = br.ue()
    require(!Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile),
      s"profile_idc $profile (High-family SPS extensions) not supported — baseline-intra subset only")
    require(profile == 66 || profile == 77,
      s"profile_idc $profile not supported (baseline-intra subset)")
    val log2MaxFrameNum = br.ue() + 4
    val pocType = br.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = br.ue() + 4
    else if (pocType == 1)
      throw new IllegalArgumentException("pic_order_cnt_type 1 not supported")
    br.ue() // max_num_ref_frames
    br.u1() // gaps_in_frame_num_value_allowed_flag
    val widthMbs = br.ue() + 1
    val heightMapUnits = br.ue() + 1
    val frameMbsOnly = br.u1()
    require(frameMbsOnly == 1, "interlaced (frame_mbs_only_flag=0) not supported")
    br.u1() // direct_8x8_inference_flag
    var (cl, crr, ct, cb) = (0, 0, 0, 0)
    if (br.u1() == 1) { cl = br.ue(); crr = br.ue(); ct = br.ue(); cb = br.ue() }
    // vui_parameters_present_flag and beyond are irrelevant to decoding
    Sps(profile, level, spsId, log2MaxFrameNum, pocType, log2MaxPocLsb,
      widthMbs, heightMapUnits, cl, crr, ct, cb)
  }

  def parsePps(rbsp: Array[Byte]): Pps = {
    val br = new BitReader(rbsp)
    val ppsId = br.ue()
    val spsId = br.ue()
    val cabac = br.u1()
    require(cabac == 0, "CABAC (entropy_coding_mode_flag=1) not supported — CAVLC only")
    br.u1() // bottom_field_pic_order_in_frame_present
    val sliceGroups = br.ue() + 1
    require(sliceGroups == 1, s"FMO ($sliceGroups slice groups) not supported")
    br.ue(); br.ue() // num_ref_idx_l{0,1}_default_active_minus1
    br.u1() // weighted_pred_flag
    br.u(2) // weighted_bipred_idc
    val picInitQp = br.se() + 26
    br.se() // pic_init_qs
    val chromaQpOffset = br.se()
    val deblockCtrl = br.u1() == 1
    br.u1() // constrained_intra_pred_flag (all-intra: no effect)
    br.u1() // redundant_pic_cnt_present_flag
    Pps(ppsId, spsId, picInitQp, chromaQpOffset, deblockCtrl)
  }

  /** Decode one coded frame from AVCC length-prefixed NAL units (the MP4
    * sample format), using parameter sets from the avcC box.
    */
  def decodeAvccSample(sample: Array[Byte], lengthSize: Int,
      sps: Sps, pps: Pps): Frame = {
    var frame: Frame = null
    var pos = 0
    while (pos + lengthSize <= sample.length) {
      var len = 0
      var i = 0
      while (i < lengthSize) { len = (len << 8) | (sample(pos + i) & 0xFF); i += 1 }
      pos += lengthSize
      require(len > 0 && pos + len <= sample.length, "bad NAL length in sample")
      val nalType = sample(pos) & 0x1F
      if (nalType == 1 || nalType == 5) {
        require(frame == null, "multiple slices per sample not supported")
        val rbsp = Nal.unescape(sample, pos + 1, pos + len)
        frame = decodeSlice(rbsp, nalType == 5, sps, pps)
      } // SPS/PPS/SEI NALs inside samples are ignored (avcC carries them)
      pos += len
    }
    require(frame != null, "sample contains no coded slice")
    frame
  }

  /** Decode an Annex-B stream (start-code framed). Returns all frames;
    * in-band SPS/PPS are honored.
    */
  def decodeAnnexB(data: Array[Byte]): Seq[Frame] = {
    val nals = splitAnnexB(data)
    var sps: Sps = null
    var pps: Pps = null
    val frames = Seq.newBuilder[Frame]
    nals.foreach { case (from, to) =>
      val nalType = data(from) & 0x1F
      val rbsp = Nal.unescape(data, from + 1, to)
      nalType match {
        case 7 => sps = parseSps(rbsp)
        case 8 => pps = parsePps(rbsp)
        case 1 | 5 =>
          require(sps != null && pps != null, "slice before SPS/PPS")
          frames += decodeSlice(rbsp, nalType == 5, sps, pps)
        case _ => // SEI / AUD / filler — skip
      }
    }
    frames.result()
  }

  private def splitAnnexB(d: Array[Byte]): Seq[(Int, Int)] = {
    val starts = Seq.newBuilder[Int]
    var i = 0
    while (i + 3 <= d.length) {
      if (d(i) == 0 && d(i + 1) == 0 &&
        (d(i + 2) == 1 || (i + 4 <= d.length && d(i + 2) == 0 && d(i + 3) == 1))) {
        val skip = if (d(i + 2) == 1) 3 else 4
        starts += i + skip
        i += skip
      } else i += 1
    }
    val s = starts.result()
    require(s.nonEmpty, "no Annex-B start codes found")
    s.zip(s.drop(1).map(n => prevNalEnd(d, n)) :+ d.length)
  }
  private def prevNalEnd(d: Array[Byte], nextStart: Int): Int = {
    // back off the start code (3 or 4 bytes) preceding nextStart
    var e = nextStart - 3
    if (e > 0 && d(e - 1) == 0) e -= 1
    e
  }

  // ------------------------------------------------------------ slice

  private def decodeSlice(rbsp: Array[Byte], idr: Boolean,
      sps: Sps, pps: Pps): Frame = {
    val br = new BitReader(rbsp)
    val firstMb = br.ue()
    require(firstMb == 0, "multi-slice frames not supported (first_mb_in_slice != 0)")
    val sliceType = br.ue()
    require(sliceType == 2 || sliceType == 7,
      s"slice_type $sliceType not supported — intra (I) slices only")
    val ppsId = br.ue()
    require(ppsId == pps.ppsId, s"slice references pps $ppsId")
    br.u(sps.log2MaxFrameNum) // frame_num
    if (idr) br.ue() // idr_pic_id
    if (sps.pocType == 0) br.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
    if (idr) { br.u1(); br.u1() } // dec_ref_pic_marking: no_output / long_term
    val sliceQp = pps.picInitQp + br.se()
    var disableDeblock = 0
    var alphaOff = 0
    var betaOff = 0
    if (pps.deblockCtrl) {
      disableDeblock = br.ue()
      require(disableDeblock <= 2, s"disable_deblocking_filter_idc $disableDeblock")
      if (disableDeblock != 1) { alphaOff = 2 * br.se(); betaOff = 2 * br.se() }
    }
    val dec = new SliceDecoder(sps, pps, sliceQp)
    dec.decodeMbs(br)
    if (disableDeblock != 1)
      Deblock.filterFrame(dec.y, dec.cb, dec.cr, sps.widthMbs, sps.heightMbs,
        dec.mbQp, pps.chromaQpOffset, alphaOff, betaOff)
    dec.crop()
  }

  /** Per-slice (= per-frame here) decoding state and MB loop. */
  private final class SliceDecoder(sps: Sps, pps: Pps, sliceQp: Int) {
    val wMb = sps.widthMbs
    val hMb = sps.heightMbs
    val ls = wMb * 16 // luma stride
    val cs = wMb * 8 // chroma stride
    val y = new Array[Int](ls * hMb * 16)
    val cb = new Array[Int](cs * hMb * 8)
    val cr = new Array[Int](cs * hMb * 8)
    // per-4x4-block CAVLC totalCoeff, luma (4wMb × 4hMb) and chroma (2wMb × 2hMb)
    private val tcY = new Array[Int](wMb * 4 * hMb * 4)
    private val tcCb = new Array[Int](wMb * 2 * hMb * 2)
    private val tcCr = new Array[Int](wMb * 2 * hMb * 2)
    // per-4x4-block intra prediction mode (−1 = not an I_4x4 block)
    private val i4Mode = Array.fill(wMb * 4 * hMb * 4)(-1)
    /** Final luma QP of each MB (deblocking needs it). */
    val mbQp = new Array[Int](wMb * hMb)

    private var qp = sliceQp

    def decodeMbs(br: BitReader): Unit = {
      var mb = 0
      val n = wMb * hMb
      while (mb < n) {
        decodeMb(br, mb % wMb, mb / wMb)
        mb += 1
      }
    }

    // --------------------------------------------------------- neighbors

    /** nC for a luma 4x4 block at global block coords (§9.2.1). */
    private def lumaNC(gbx: Int, gby: Int): Int = {
      val availA = gbx > 0
      val availB = gby > 0
      if (availA && availB) (tcY((gby) * wMb * 4 + gbx - 1) +
        tcY((gby - 1) * wMb * 4 + gbx) + 1) >> 1
      else if (availA) tcY(gby * wMb * 4 + gbx - 1)
      else if (availB) tcY((gby - 1) * wMb * 4 + gbx)
      else 0
    }

    private def chromaNC(tc: Array[Int], gbx: Int, gby: Int): Int = {
      val availA = gbx > 0
      val availB = gby > 0
      if (availA && availB) (tc(gby * wMb * 2 + gbx - 1) +
        tc((gby - 1) * wMb * 2 + gbx) + 1) >> 1
      else if (availA) tc(gby * wMb * 2 + gbx - 1)
      else if (availB) tc((gby - 1) * wMb * 2 + gbx)
      else 0
    }

    // ------------------------------------------------------------- MB

    private def decodeMb(br: BitReader, mbX: Int, mbY: Int): Unit = {
      val mbType = br.ue()
      // §8.7: I_PCM MBs deblock with QPY = 0 (alpha/beta 0 → edges kept)
      if (mbType == 25) { decodePcm(br, mbX, mbY); mbQp(mbY * wMb + mbX) = 0 }
      else if (mbType == 0) { decodeI4x4(br, mbX, mbY); mbQp(mbY * wMb + mbX) = qp }
      else if (mbType <= 24) { decodeI16x16(br, mbType - 1, mbX, mbY); mbQp(mbY * wMb + mbX) = qp }
      else throw new IllegalArgumentException(
        s"mb_type $mbType in I slice (inter-coded input?) not supported")
    }

    private def decodePcm(br: BitReader, mbX: Int, mbY: Int): Unit = {
      br.alignToByte()
      val x0 = mbX * 16; val y0 = mbY * 16
      for (yy <- 0 until 16; xx <- 0 until 16)
        y((y0 + yy) * ls + x0 + xx) = br.u(8)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for (yy <- 0 until 8; xx <- 0 until 8) cb((cy0 + yy) * cs + cx0 + xx) = br.u(8)
      for (yy <- 0 until 8; xx <- 0 until 8) cr((cy0 + yy) * cs + cx0 + xx) = br.u(8)
      // PCM counts as fully-coded for CAVLC context (§9.2.1: nA/nB = 16)
      for (by <- 0 until 4; bx <- 0 until 4)
        tcY((mbY * 4 + by) * wMb * 4 + mbX * 4 + bx) = 16
      for (by <- 0 until 2; bx <- 0 until 2) {
        tcCb((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = 16
        tcCr((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = 16
      }
    }

    /** Gather luma 4x4 neighbors for a block at sample coords (sx, sy).
      * Returns (u8, l4, corner, availU, availL) with the §8.3.1.2
      * above-right substitution applied.
      */
    private def lumaNeighbors(sx: Int, sy: Int, mbX: Int, mbY: Int,
        blkIdxInMb: Int): (Array[Int], Array[Int], Int, Boolean, Boolean) = {
      val availU = sy > 0
      val availL = sx > 0
      val u = new Array[Int](8)
      val l = new Array[Int](4)
      var c = 128
      if (availU) {
        var i = 0
        while (i < 4) { u(i) = y((sy - 1) * ls + sx + i); i += 1 }
        // above-right: available iff in-picture and already decoded
        val urAvail = sx + 4 < ls && {
          val nMbX = (sx + 4) / 16; val nMbY = (sy - 1) / 16
          if (nMbY < mbY) true
          else { // same MB row: must be a previous MB, or earlier block in this MB
            if (nMbX != mbX) nMbX < mbX
            else {
              val bx = (sx + 4) / 4 - mbX * 4; val by = (sy - 1) / 4 - mbY * 4
              mortonLt(bx, by, blkX(blkIdxInMb), blkY(blkIdxInMb))
            }
          }
        }
        if (urAvail) {
          var i = 4
          while (i < 8) { u(i) = y((sy - 1) * ls + sx + i); i += 1 }
        } else {
          var i = 4
          while (i < 8) { u(i) = u(3); i += 1 }
        }
      }
      if (availL) {
        var i = 0
        while (i < 4) { l(i) = y((sy + i) * ls + sx - 1); i += 1 }
      }
      if (availU && availL) c = y((sy - 1) * ls + sx - 1)
      else if (availU) c = u(0)
      else if (availL) c = l(0)
      (u, l, c, availU, availL)
    }

    /** Morton/decode-order comparison for 4x4 blocks within one MB. */
    private def mortonLt(bx: Int, by: Int, curBx: Int, curBy: Int): Boolean = {
      def code(x: Int, yy: Int) =
        ((yy >> 1) << 3) | ((x >> 1) << 2) | ((yy & 1) << 1) | (x & 1)
      code(bx, by) < code(curBx, curBy)
    }

    private def decodeI4x4(br: BitReader, mbX: Int, mbY: Int): Unit = {
      // prediction modes for all 16 blocks (bitstream order)
      val modes = new Array[Int](16)
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        // §8.3.1.1: DC if either neighbor block is unavailable; otherwise
        // Min of the neighbor modes, where a non-I_4x4 neighbor MB reads
        // as DC (stored −1 → 2)
        val pred =
          if (gbx == 0 || gby == 0) 2
          else {
            val mA = i4Mode(gby * wMb * 4 + gbx - 1)
            val mB = i4Mode((gby - 1) * wMb * 4 + gbx)
            math.min(if (mA < 0) 2 else mA, if (mB < 0) 2 else mB)
          }
        val mode =
          if (br.u1() == 1) pred
          else { val rem = br.u(3); if (rem < pred) rem else rem + 1 }
        modes(i) = mode
        i4Mode(gby * wMb * 4 + gbx) = mode
        i += 1
      }
      val chromaMode = br.ue()
      require(chromaMode <= 3, s"intra_chroma_pred_mode $chromaMode")
      val cbpCode = br.ue()
      require(cbpCode < 48, s"coded_block_pattern code $cbpCode")
      val cbp = CbpIntra(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) bumpQp(br.se())

      // parse residual for all 16 blocks (coeffs in scan order)
      val blocks = new Array[Array[Int]](16)
      i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val blk = Cavlc.decodeBlock(br, lumaNC(gbx, gby), 16)
          blocks(i) = blk.coeffs
          tcY(gby * wMb * 4 + gbx) = blk.totalCoeff
        } else {
          blocks(i) = null
          tcY(gby * wMb * 4 + gbx) = 0
        }
        i += 1
      }
      val chroma = parseChromaResidual(br, mbX, mbY, cbpChroma)

      // reconstruct blocks in decode order (prediction uses recon samples)
      i = 0
      while (i < 16) {
        val sx = mbX * 16 + blkX(i) * 4
        val sy = mbY * 16 + blkY(i) * 4
        val (u, l, c, aU, aL) = lumaNeighbors(sx, sy, mbX, mbY, i)
        Predict.luma4x4(modes(i), y, ls, sx, sy, u, l, c, aU, aL)
        if (blocks(i) != null) {
          val raster = unzigzag(blocks(i), 0)
          val res = Transform.inverse4x4(Transform.dequant4x4(raster, qp, skipDc = false))
          addResidual4x4(y, ls, sx, sy, res)
        }
        i += 1
      }
      reconChroma(mbX, mbY, chromaMode, chroma)
    }

    private def decodeI16x16(br: BitReader, typeIdx: Int, mbX: Int, mbY: Int): Unit = {
      val predMode = typeIdx % 4
      val cbpChroma = (typeIdx / 4) % 3
      val cbpLuma = if (typeIdx >= 12) 15 else 0
      val chromaMode = br.ue()
      require(chromaMode <= 3, s"intra_chroma_pred_mode $chromaMode")
      bumpQp(br.se())

      // luma DC block: nC as for block 0
      val dcBlk = Cavlc.decodeBlock(br, lumaNC(mbX * 4, mbY * 4), 16)
      val dcRaster = unzigzag(dcBlk.coeffs, 0)
      val dcScaled = Transform.dequantLumaDc(dcRaster, qp)

      // AC blocks
      val blocks = new Array[Array[Int]](16)
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        if (cbpLuma != 0) {
          val blk = Cavlc.decodeBlock(br, lumaNC(gbx, gby), 15)
          blocks(i) = blk.coeffs
          tcY(gby * wMb * 4 + gbx) = blk.totalCoeff
        } else {
          tcY(gby * wMb * 4 + gbx) = 0
        }
        i += 1
      }
      val chroma = parseChromaResidual(br, mbX, mbY, cbpChroma)

      // predict the whole 16x16, then add per-block residual
      val sx0 = mbX * 16; val sy0 = mbY * 16
      val (u, l, c, aU, aL) = gatherEdge(y, ls, sx0, sy0, 16)
      Predict.luma16x16(predMode, y, ls, sx0, sy0, u, l, c, aU, aL)
      i = 0
      while (i < 16) {
        val raster = if (blocks(i) != null) unzigzagAc(blocks(i)) else new Array[Int](16)
        val scaled = Transform.dequant4x4(raster, qp, skipDc = true)
        scaled(0) = dcScaled(blkY(i) * 4 + blkX(i))
        val res = Transform.inverse4x4(scaled)
        addResidual4x4(y, ls, sx0 + blkX(i) * 4, sy0 + blkY(i) * 4, res)
        i += 1
      }
      reconChroma(mbX, mbY, chromaMode, chroma)
    }

    /** Chroma residual: (dcCb, dcCr, acCb(4), acCr(4)) or nulls. */
    private def parseChromaResidual(br: BitReader, mbX: Int, mbY: Int,
        cbpChroma: Int): (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]]) = {
      var dcCb: Array[Int] = null
      var dcCr: Array[Int] = null
      val acCb = new Array[Array[Int]](4)
      val acCr = new Array[Array[Int]](4)
      if (cbpChroma > 0) {
        dcCb = Cavlc.decodeBlock(br, -1, 4).coeffs
        dcCr = Cavlc.decodeBlock(br, -1, 4).coeffs
      }
      for ((tc, ac) <- Seq((tcCb, acCb), (tcCr, acCr))) {
        var b = 0
        while (b < 4) {
          val gbx = mbX * 2 + (b & 1)
          val gby = mbY * 2 + (b >> 1)
          if (cbpChroma == 2) {
            val blk = Cavlc.decodeBlock(br, chromaNC(tc, gbx, gby), 15)
            ac(b) = blk.coeffs
            tc(gby * wMb * 2 + gbx) = blk.totalCoeff
          } else {
            tc(gby * wMb * 2 + gbx) = 0
          }
          b += 1
        }
      }
      (dcCb, dcCr, acCb, acCr)
    }

    private def reconChroma(mbX: Int, mbY: Int, chromaMode: Int,
        res: (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]])): Unit = {
      val qpC = Transform.chromaQp(qp, pps.chromaQpOffset)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for ((plane, dc, ac) <- Seq((cb, res._1, res._3), (cr, res._2, res._4))) {
        val (u, l, c, aU, aL) = gatherEdge(plane, cs, cx0, cy0, 8)
        Predict.chroma8x8(chromaMode, plane, cs, cx0, cy0, u, l, c, aU, aL)
        val dcScaled =
          if (dc != null) Transform.dequantChromaDc(dc, qpC) else new Array[Int](4)
        var b = 0
        while (b < 4) {
          val raster = if (ac(b) != null) unzigzagAc(ac(b)) else new Array[Int](16)
          val scaled = Transform.dequant4x4(raster, qpC, skipDc = true)
          scaled(0) = dcScaled(b)
          val r = Transform.inverse4x4(scaled)
          addResidual4x4(plane, cs, cx0 + (b & 1) * 4, cy0 + (b >> 1) * 4, r)
          b += 1
        }
      }
    }

    /** Gather the top row (n), left column (n) and corner of an n×n
      * region's neighbors from `plane`.
      */
    private def gatherEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
        n: Int): (Array[Int], Array[Int], Int, Boolean, Boolean) = {
      val availU = y0 > 0
      val availL = x0 > 0
      val u = new Array[Int](n)
      val l = new Array[Int](n)
      var c = 128
      if (availU) { var i = 0; while (i < n) { u(i) = plane((y0 - 1) * stride + x0 + i); i += 1 } }
      if (availL) { var i = 0; while (i < n) { l(i) = plane((y0 + i) * stride + x0 - 1); i += 1 } }
      if (availU && availL) c = plane((y0 - 1) * stride + x0 - 1)
      (u, l, c, availU, availL)
    }

    private def addResidual4x4(plane: Array[Int], stride: Int, x0: Int, y0: Int,
        res: Array[Int]): Unit = {
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val p = (y0 + yy) * stride + x0 + xx
          plane(p) = Transform.clip255(plane(p) + res(yy * 4 + xx))
          xx += 1
        }
        yy += 1
      }
    }

    private def bumpQp(delta: Int): Unit = {
      require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta out of range")
      qp = (qp + delta + 52) % 52
    }

    /** Scan-order → raster via zig-zag, full 16 coefficients. */
    private def unzigzag(scan: Array[Int], from: Int): Array[Int] = {
      val out = new Array[Int](16)
      var i = from
      while (i < 16) { out(Transform.Zigzag(i)) = scan(i - from); i += 1 }
      out
    }

    /** AC-only block (15 scan coeffs at zig-zag positions 1..15). */
    private def unzigzagAc(scan: Array[Int]): Array[Int] = {
      val out = new Array[Int](16)
      var i = 1
      while (i < 16) { out(Transform.Zigzag(i)) = scan(i - 1); i += 1 }
      out
    }

    def crop(): Frame = {
      val w = sps.width; val h = sps.height
      val ox = sps.cropLeft * 2; val oy = sps.cropTop * 2
      val oy2 = new Array[Int](w * h)
      var yy = 0
      while (yy < h) {
        System.arraycopy(y, (oy + yy) * ls + ox, oy2, yy * w, w)
        yy += 1
      }
      val cw = w / 2; val ch = h / 2
      val ocb = new Array[Int](cw * ch)
      val ocr = new Array[Int](cw * ch)
      yy = 0
      while (yy < ch) {
        System.arraycopy(cb, (sps.cropTop + yy) * cs + sps.cropLeft, ocb, yy * cw, cw)
        System.arraycopy(cr, (sps.cropTop + yy) * cs + sps.cropLeft, ocr, yy * cw, cw)
        yy += 1
      }
      Frame(w, h, oy2, ocb, ocr)
    }
  }
}
