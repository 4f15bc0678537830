package graft.multimodal.h264

/** From-scratch H.264 baseline ENCODER — the fixture-writer half of the
  * codec pair (the Hdf5TestWriter/SzipTestEncoder precedent: built from
  * the public spec so the decoder can be exercised over real bitstreams
  * in an environment with no third-party encoder).
  *
  * Emits streams inside the supported subset: CAVLC; single- or
  * multi-slice pictures (`sliceRows`); IDR-only (I_4x4 + I_16x16 SAD
  * mode decision, optional I_PCM), IPPP (`pFrames`: P_Skip, every
  * partition family — P_L0 16x16 / 16x8 / 8x16 and P_8x8 with
  * sub_mb_types cycling down to 4x4 — two-stage quarter-pel search
  * around the shared MV predictor, up to two reference frames with
  * periodic explicit list reordering, periodic intra-in-P MBs), or
  * I P B P B (`bFrames`: non-reference spatial-direct B slices cycling
  * B_Skip / B_Direct_16x16 / Bi / L0 / L1 16x16 / mixed-list 16x8 /
  * B_8x8 with direct + Bi + 8x4 + 4x4 sub-partitions, POC type 0,
  * Main-profile SPS); flat QP, optional deblocking. The encoder
  * maintains the decoder-identical reconstruction (prediction from
  * reconstructed/deblocked references, §8.4/§8.5 normative paths,
  * shared [[MvPred]]/[[BDirect]]), so `H264Decoder` output must match
  * [[Encoded.recon]] BIT-EXACTLY — the round-trip contract H264Spec
  * pins.
  */
object H264Encoder {

  /** `pcmEvery` = 0 disables I_PCM; n > 0 codes every n-th MB of INTRA
    * frames as PCM (1 = every MB, the lossless path the m8 oracle relies
    * on). `pFrames` switches GOP structure from all-IDR to IPPP.
    * `bFrames` (implies pFrames) codes I P B P B …: every odd display
    * frame becomes a NON-REFERENCE B slice predicting past (L0) and
    * future (L1) — decode order differs from display order, POC type 0
    * orders output, the MP4 layer carries ctts offsets. `sliceRows` > 0
    * splits every picture into one slice per group of that many MB rows
    * (the multi-slice framing hardware encoders emit); 0 = single slice.
    * `noSliceEdgeDeblock` writes disable_deblocking_filter_idc = 2
    * (filter on, but slice-boundary MB edges excluded) when multi-slice.
    */
  final case class Config(
      qp: Int = 28, pcmEvery: Int = 0, deblock: Boolean = true,
      pFrames: Boolean = false, bFrames: Boolean = false, sliceRows: Int = 0,
      noSliceEdgeDeblock: Boolean = false,
      weightedPred: Boolean = false, implicitWeightedB: Boolean = false,
      longTermRefs: Boolean = false, pocType1: Boolean = false,
      temporalDirectB: Boolean = false, idrEvery: Int = 0,
      crQpOffset: Int = 0) // nonzero → High-style PPS extension (per-plane Cr QP)

  /** `samples`/`recon` are in DECODE order; `display(i)` is sample i's
    * display index (identity without B frames) and `ctsOffset(i)` the
    * non-negative composition-time offset the MP4 ctts box carries.
    */
  final case class Encoded(
      width: Int, height: Int,
      sps: Array[Byte], pps: Array[Byte],
      samples: Seq[Array[Byte]], // AVCC samples, 4-byte BE NAL lengths
      sampleIsIdr: Seq[Boolean],
      recon: Seq[H264Decoder.Frame], // what a conformant decoder must output
      display: Seq[Int] = Seq.empty) {
    def displayOrder: Seq[Int] =
      if (display.nonEmpty) display else samples.indices
    /** ctts offsets under a one-frame reorder delay (dts n, cts d+1). */
    def ctsOffsets: Seq[Int] =
      displayOrder.zipWithIndex.map { case (d, n) => d + 1 - n }
  }

  /** Encode luma-only (grayscale) frames; chroma coded flat 128. */
  def encodeGray(frames: Seq[Array[Byte]], width: Int, height: Int,
      cfg: Config = Config()): Encoded = {
    val cw = (width + 1) / 2; val ch = (height + 1) / 2
    encodeYuv(frames.map { f =>
      (f.map(_ & 0xFF), Array.fill(cw * ch)(128), Array.fill(cw * ch)(128))
    }, width, height, cfg)
  }

  /** Encode 4:2:0 YCbCr frames (planes as 0..255 ints, DISPLAY order;
    * samples come back in DECODE order — identical unless `bFrames`).
    */
  def encodeYuv(frames: Seq[(Array[Int], Array[Int], Array[Int])],
      width: Int, height: Int, cfg: Config = Config()): Encoded = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"4:2:0 requires even dimensions, got ${width}x$height")
    require(cfg.qp >= 0 && cfg.qp <= 51, s"qp ${cfg.qp}")
    val wMb = (width + 15) / 16
    val hMb = (height + 15) / 16
    val useB = cfg.bFrames && frames.size > 2
    // POC type: B needs output-order POC — type 0 (lsb) by default, or
    // the type-1 cycle (ref frames poc 4·fn, non-refs offset −2, which
    // lands every picture on poc = 2·display, same as type 0's values)
    val sps = writeSps(wMb, hMb, width, height,
      pocType = if (useB) { if (cfg.pocType1) 1 else 0 } else 2,
      maxRef = if (cfg.longTermRefs) 4 else if (useB) 3 else 2)
    val bipredIdc =
      if (useB && cfg.implicitWeightedB) 2
      else if (useB && cfg.weightedPred) 1 else 0
    val pps = writePps(cfg.qp, cfg.weightedPred, bipredIdc, cfg.crQpOffset)
    val spsP = H264Decoder.parseSps(Nal.unescape(sps, 1, sps.length))
    val ppsP = H264Decoder.parsePps(Nal.unescape(pps, 1, pps.length))

    // coding order over display indices: all-IDR, IPPP, or I P B P B …
    // (each B codes AFTER its future reference)
    val n = frames.size
    val order: Seq[(Int, Char)] =
      if (!cfg.pFrames && !cfg.bFrames) frames.indices.map(i => (i, 'I'))
      else if (!useB) frames.indices.map { i =>
        val idr = i == 0 || (cfg.idrEvery > 0 && i % cfg.idrEvery == 0)
        (i, if (idr) 'I' else 'P')
      }
      else {
        val b = Seq.newBuilder[(Int, Char)]
        b += ((0, 'I'))
        var d = 2
        while (d < n) { b += ((d, 'P')); b += ((d - 1, 'B')); d += 2 }
        if (n % 2 == 0) b += ((n - 1, 'P'))
        b.result()
      }

    val dpb = scala.collection.mutable.ArrayBuffer.empty[H264Decoder.DpbPic]
    var nextPicId = 0
    var prevRefFrameNum = 0
    var maxLtIdx = -1
    val samples = Seq.newBuilder[Array[Byte]]
    val idrs = Seq.newBuilder[Boolean]
    val recons = Seq.newBuilder[H264Decoder.Frame]
    val displays = Seq.newBuilder[Int]
    order.foreach { case (display, kind) =>
      val (y, cbP, crP) = frames(display)
      require(y.length == width * height, "luma plane size")
      val idr = kind == 'I'
      val isB = kind == 'B'
      if (idr) dpb.clear()
      // frame_num: 0 at IDR; PrevRefFrameNum+1 afterwards (a non-ref B
      // shares the value the NEXT reference will carry)
      val maxFn = 1 << spsP.log2MaxFrameNum
      val frameNum = if (idr) 0 else (prevRefFrameNum + 1) % maxFn
      if (!isB) prevRefFrameNum = frameNum
      val poc = 2 * display
      // dec_ref_pic_marking: the long-term fixture marks the IDR as the
      // long-term anchor, then exercises every supported MMCO — 4+3
      // (widen the idx space, convert the oldest short), 1 (drop a
      // short), 2 (drop the converted long) — at fixed frame numbers
      val shortFns = dpb.filter(!_.longTerm).map(_.frameNum).sorted
      def shortDiff(rank: Int): Int = frameNum - shortFns(rank) - 1
      val marking: H264Decoder.Marking =
        if (idr) H264Decoder.Marking(adaptive = false,
          idrLongTerm = cfg.longTermRefs)
        else if (kind == 'P' && cfg.longTermRefs) {
          val ops = Seq.newBuilder[H264Decoder.Mmco]
          if (frameNum == 4 && shortFns.size >= 2) {
            // adaptive marking replaces the sliding window, so the op
            // list itself must free a slot for the incoming picture
            ops += H264Decoder.SetMaxLt(2) // allow LongTermFrameIdx 0..1
            ops += H264Decoder.ShortToLong(shortDiff(0), 1)
            ops += H264Decoder.UnmarkShort(shortDiff(1))
          }
          if (frameNum == 7 && shortFns.nonEmpty)
            ops += H264Decoder.UnmarkShort(shortDiff(0))
          if (frameNum == 9 && dpb.exists(p => p.longTerm && p.ltIdx == 1))
            ops += H264Decoder.UnmarkLong(1)
          if (frameNum == 11) ops += H264Decoder.ResetAll // soft IDR
          val o = ops.result()
          H264Decoder.Marking(adaptive = o.nonEmpty, o)
        } else H264Decoder.Marking(adaptive = false)
      // reference lists: P short-term by descending PicNum then
      // long-term by ascending idx (§8.2.4.2.1); B splits short-terms
      // by POC — past desc → L0, future asc → L1
      var refs0 = H264Decoder.initListP(dpb.toIndexedSeq, frameNum, maxFn)
      var refs1 = IndexedSeq.empty[H264Decoder.DpbPic]
      var refMod: Seq[(Int, Int)] = Nil
      if (kind == 'P') {
        val numRefActive = math.min(2, dpb.size)
        if (cfg.longTermRefs && frameNum % 3 == 1 && dpb.exists(_.longTerm)) {
          // pull the long-term anchor to ref_idx 0 via an idc-2 command
          val lt = refs0.filter(_.longTerm).minBy(_.ltIdx)
          refs0 = lt +: refs0.filterNot(_ eq lt)
          refMod = Seq((2, lt.ltIdx))
        } else if (!cfg.longTermRefs && numRefActive >= 2 && frameNum % 3 == 0) {
          // every third P frame with two refs REORDERS the list (oldest
          // first) via explicit modification commands — exercises the
          // decoder's §8.2.4.3 path; the reordered list is what ref_idx
          // indexes on both sides
          refs0 = (dpb.take(numRefActive).reverse ++ dpb.drop(numRefActive)).toIndexedSeq
          var pred = frameNum
          refMod = refs0.take(numRefActive).map { p =>
            val diff = p.frameNum - pred
            pred = p.frameNum
            if (diff < 0) (0, -diff - 1) else (1, diff - 1)
          }
        }
        refs0 = refs0.take(math.max(numRefActive, 1))
      } else if (isB) {
        refs0 = dpb.filter(_.poc < poc).sortBy(p => -p.poc).toIndexedSeq
        refs1 = dpb.filter(_.poc > poc).sortBy(_.poc).toIndexedSeq.take(1)
        require(refs0.nonEmpty && refs1.nonEmpty, "B frame without both refs")
        refs0 = refs0.take(2)
      }
      val enc = new FrameEncoder(wMb, hMb, cfg, spsP, ppsP,
        refs0, refs1, kind, frameNum, poc, refMod, marking)
      val nals = enc.encodeFrame(pad(y, width, height, wMb * 16, hMb * 16),
        pad(cbP, width / 2, height / 2, wMb * 8, hMb * 8),
        pad(crP, width / 2, height / 2, wMb * 8, hMb * 8))
      val (frame, ref) = enc.finishFrame()
      if (!isB) { // non-reference pictures never enter the DPB
        val curr =
          H264Decoder.DpbPic(ref, frameNum, nextPicId, poc, enc.motionOf())
        if (idr) {
          maxLtIdx = if (marking.idrLongTerm) 0 else -1
          dpb.insert(0, if (marking.idrLongTerm)
            curr.copy(longTerm = true, ltIdx = 0) else curr)
        } else {
          // the SAME §8.2.5 marking the decoder will apply
          maxLtIdx = H264Decoder.applyMarking(dpb, marking, curr, frameNum,
            maxFn, spsP.maxNumRefFrames, maxLtIdx)
          if (marking.ops.contains(H264Decoder.ResetAll)) prevRefFrameNum = 0
        }
      }
      nextPicId += 1
      val sample = new java.io.ByteArrayOutputStream()
      nals.foreach { nal =>
        sample.write(Array[Byte](
          ((nal.length >> 24) & 0xFF).toByte, ((nal.length >> 16) & 0xFF).toByte,
          ((nal.length >> 8) & 0xFF).toByte, (nal.length & 0xFF).toByte))
        sample.write(nal)
      }
      samples += sample.toByteArray
      idrs += idr
      recons += frame
      displays += display
    }
    Encoded(width, height, sps, pps, samples.result(), idrs.result(),
      recons.result(), displays.result())
  }

  /** Replicate-pad a plane to MB-aligned dimensions. */
  private def pad(p: Array[Int], w: Int, h: Int, wPad: Int, hPad: Int): Array[Int] = {
    val out = new Array[Int](wPad * hPad)
    var y = 0
    while (y < hPad) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < wPad) {
        out(y * wPad + x) = p(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  /** avcC (ISO/IEC 14496-15 §5.2.4.1) for the MP4 sample entry. */
  def avcC(sps: Array[Byte], pps: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(1) // configurationVersion
    b.write(sps(1)); b.write(sps(2)); b.write(sps(3)) // profile/compat/level
    b.write(0xFF) // reserved + lengthSizeMinusOne=3
    b.write(0xE1) // reserved + numOfSequenceParameterSets=1
    b.write(sps.length >> 8); b.write(sps.length & 0xFF); b.write(sps, 0, sps.length)
    b.write(1) // numOfPictureParameterSets
    b.write(pps.length >> 8); b.write(pps.length & 0xFF); b.write(pps, 0, pps.length)
    b.toByteArray
  }

  /** Annex-B dump of the whole stream (SPS, PPS, then each frame's NALs
    * — a multi-slice picture contributes one NAL per slice).
    */
  def annexB(e: Encoded): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def start(): Unit = out.write(Array[Byte](0, 0, 0, 1))
    start(); out.write(e.sps)
    start(); out.write(e.pps)
    e.samples.foreach { s =>
      var pos = 0
      while (pos + 4 <= s.length) { // each AVCC length-prefixed NAL
        val len = ((s(pos) & 0xFF) << 24) | ((s(pos + 1) & 0xFF) << 16) |
          ((s(pos + 2) & 0xFF) << 8) | (s(pos + 3) & 0xFF)
        start(); out.write(s, pos + 4, len)
        pos += 4 + len
      }
    }
    out.toByteArray
  }

  private def writeSps(wMb: Int, hMb: Int, width: Int, height: Int,
      pocType: Int = 2, maxRef: Int = 2): Array[Byte] = {
    val bw = new BitWriter
    // profile: Baseline for the P/I subset; B slices need Main (77)
    bw.putBits(if (pocType == 0) 77 else 66, 8)
    bw.putBits(if (pocType == 0) 0x40 else 0xC0, 8) // constraint_set flags
    bw.putBits(30, 8) // level 3.0
    bw.ue(0) // sps_id
    bw.ue(4) // log2_max_frame_num_minus4 → 8-bit frame_num
    bw.ue(pocType) // pic_order_cnt_type
    if (pocType == 0) bw.ue(4) // log2_max_pic_order_cnt_lsb_minus4 → 8-bit lsb
    else if (pocType == 1) {
      bw.put(0) // delta_pic_order_always_zero_flag: slices carry delta[0]
      bw.se(-2) // offset_for_non_ref_pic (B sits 2 before its future ref)
      bw.se(0) // offset_for_top_to_bottom_field
      bw.ue(1) // one-entry ref cycle
      bw.se(4) // offset_for_ref_frame[0]: ref POC = 4·frame_num
    }
    bw.ue(maxRef) // max_num_ref_frames
    bw.put(0) // gaps_in_frame_num_value_allowed
    bw.ue(wMb - 1)
    bw.ue(hMb - 1)
    bw.put(1) // frame_mbs_only
    bw.put(1) // direct_8x8_inference
    val cropR = (wMb * 16 - width) / 2
    val cropB = (hMb * 16 - height) / 2
    if (cropR > 0 || cropB > 0) {
      bw.put(1); bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB)
    } else bw.put(0)
    bw.put(0) // vui_parameters_present
    bw.rbspTrailing()
    Nal.unit(3, 7, bw.toBytes)
  }

  private def writePps(qp: Int, weightedPred: Boolean = false,
      bipredIdc: Int = 0, crQpOffset: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0); bw.ue(0) // pps_id, sps_id
    bw.put(0) // entropy_coding_mode: CAVLC
    bw.put(0) // bottom_field_pic_order_in_frame_present
    bw.ue(0) // num_slice_groups_minus1
    bw.ue(0); bw.ue(0) // num_ref_idx defaults
    bw.put(if (weightedPred) 1 else 0) // weighted_pred
    bw.putBits(bipredIdc, 2) // weighted_bipred_idc
    bw.se(qp - 26) // pic_init_qp_minus26
    bw.se(0) // pic_init_qs_minus26
    bw.se(0) // chroma_qp_index_offset
    bw.put(1) // deblocking_filter_control_present
    bw.put(0) // constrained_intra_pred
    bw.put(0) // redundant_pic_cnt_present
    if (crQpOffset != 0) { // High-style PPS extension for the Cr offset
      bw.put(0) // transform_8x8_mode_flag
      bw.put(0) // pic_scaling_matrix_present_flag
      bw.se(crQpOffset) // second_chroma_qp_index_offset
    }
    bw.rbspTrailing()
    Nal.unit(3, 8, bw.toBytes)
  }

  // ------------------------------------------------------------------

  private final class FrameEncoder(wMb: Int, hMb: Int, cfg: Config,
      sps: H264Decoder.Sps, pps: H264Decoder.Pps,
      refs0: IndexedSeq[H264Decoder.DpbPic],
      refs1: IndexedSeq[H264Decoder.DpbPic],
      kind: Char, frameNum: Int, poc: Int,
      refMod: Seq[(Int, Int)] = Nil,
      marking: H264Decoder.Marking = H264Decoder.Marking(adaptive = false)) {
    private val ls = wMb * 16
    private val cs = wMb * 8
    private val hPix = hMb * 16
    private val hcPix = hMb * 8
    private val y = new Array[Int](ls * hPix) // reconstruction
    private val cbP = new Array[Int](cs * hcPix)
    private val crP = new Array[Int](cs * hcPix)
    private val tcY = new Array[Int](wMb * 4 * hMb * 4)
    private val tcCb = new Array[Int](wMb * 2 * hMb * 2)
    private val tcCr = new Array[Int](wMb * 2 * hMb * 2)
    private val i4Mode = Array.fill(wMb * 4 * hMb * 4)(-1)
    private val mbQp = Array.fill(wMb * hMb)(cfg.qp)
    private val bstate = new BlockState(wMb, hMb)
    private val qp = cfg.qp
    private val qpC = Transform.chromaQp(qp, 0) // Cb (cb offset stays 0)
    private val qpCr2 = Transform.chromaQp(qp, cfg.crQpOffset)
    private val idr = kind == 'I'
    private val isP = kind == 'P'
    private val isB = kind == 'B'
    private val numRefActive0 = refs0.size
    private val numRefActive1 = refs1.size

    private def refOf(list: Int, idx: Int): H264Decoder.RefFrame =
      (if (list == 0) refs0 else refs1)(idx).ref
    private def picIdOf(list: Int, idx: Int): Int =
      (if (list == 0) refs0 else refs1)(idx).picId

    /** Explicit weight table for weighted slices: non-trivial,
      * frame-dependent values so round-trips exercise real weighting
      * (ref 0 alternates weight/offset, later refs scale down).
      */
    private val explicitW: Option[H264Decoder.WeightTable] =
      if ((isP && pps.weightedPred) || (isB && pps.weightedBipredIdc == 1)) {
        def table(count: Int, listOff: Int): IndexedSeq[H264Decoder.RefWeight] =
          (0 until count).map { i =>
            if ((frameNum + i + listOff) % 2 == 1)
              H264Decoder.RefWeight(80, -3, 56, 2, 72, -1)
            else H264Decoder.RefWeight(64, 0, 64, 0, 64, 0)
          }
        Some(H264Decoder.WeightTable(6, 6, table(numRefActive0, 0),
          if (isB) table(numRefActive1, 1) else IndexedSeq.empty))
      } else None
    private val implicitW = isB && pps.weightedBipredIdc == 2

    /** The finished picture's motion field (DPB storage for direct). */
    def motionOf(): H264Decoder.PicMotion = H264Decoder.PicMotion(
      bstate.refIdx(0).clone(), bstate.refIdx(1).clone(),
      bstate.mvX(0).clone(), bstate.mvY(0).clone(),
      bstate.mvX(1).clone(), bstate.mvY(1).clone(),
      bstate.refPic(0).clone(), bstate.refPic(1).clone())

    import H264Decoder.{blkX, blkY}

    /** Encoded disable_deblocking_filter_idc (shared by every slice). */
    private val deblockIdc =
      if (!cfg.deblock) 1
      else if (cfg.noSliceEdgeDeblock && cfg.sliceRows > 0 &&
        cfg.sliceRows < hMb) 2
      else 0

    /** Encode the picture as one NAL per slice (`cfg.sliceRows` MB rows
      * each; 0 = single slice covering the picture).
      */
    def encodeFrame(srcY: Array[Int], srcCb: Array[Int],
        srcCr: Array[Int]): Seq[Array[Byte]] = {
      val n = wMb * hMb
      val rowsPerSlice = if (cfg.sliceRows <= 0) hMb else cfg.sliceRows
      (0 until hMb by rowsPerSlice).zipWithIndex.map { case (row0, sliceIdx) =>
        val mbStart = row0 * wMb
        val mbEnd = math.min(n, (row0 + rowsPerSlice) * wMb)
        bstate.curSlice = sliceIdx
        encodeSlice(srcY, srcCb, srcCr, mbStart, mbEnd)
      }
    }

    private def encodeSlice(srcY: Array[Int], srcCb: Array[Int],
        srcCr: Array[Int], mbStart: Int, mbEnd: Int): Array[Byte] = {
      val bw = new BitWriter
      val inter = isP || isB
      // slice header
      bw.ue(mbStart) // first_mb_in_slice
      bw.ue(if (isP) 5 else if (isB) 6 else 7) // slice_type (all slices)
      bw.ue(0) // pps_id
      bw.putBits(frameNum & ((1 << sps.log2MaxFrameNum) - 1), sps.log2MaxFrameNum)
      if (idr) bw.ue(0) // idr_pic_id
      if (sps.pocType == 0)
        bw.putBits(poc & ((1 << sps.log2MaxPocLsb) - 1), sps.log2MaxPocLsb)
      else if (sps.pocType == 1 && !sps.deltaAlwaysZero)
        bw.se(0) // delta_pic_order_cnt[0]
      if (isB) bw.put(if (cfg.temporalDirectB) 0 else 1) // direct_spatial_mv_pred_flag
      if (inter) {
        val overrides = numRefActive0 != 1 || (isB && numRefActive1 != 1)
        if (overrides) {
          bw.put(1); bw.ue(numRefActive0 - 1)
          if (isB) bw.ue(numRefActive1 - 1)
        } else bw.put(0)
        if (refMod.isEmpty) bw.put(0) // ref_pic_list_modification_flag_l0
        else {
          bw.put(1)
          refMod.foreach { case (idc, absDiffM1) => bw.ue(idc); bw.ue(absDiffM1) }
          bw.ue(3) // end of modification commands
        }
        if (isB) bw.put(0) // ref_pic_list_modification_flag_l1
        explicitW.foreach { wt => // pred_weight_table (§7.3.3.2)
          bw.ue(wt.logWDy); bw.ue(wt.logWDc)
          def put(l: IndexedSeq[H264Decoder.RefWeight]): Unit = l.foreach { rw =>
            bw.put(1); bw.se(rw.wY); bw.se(rw.oY)
            bw.put(1); bw.se(rw.wCb); bw.se(rw.oCb); bw.se(rw.wCr); bw.se(rw.oCr)
          }
          put(wt.l0)
          if (isB) put(wt.l1)
        }
      }
      if (idr) { // dec_ref_pic_marking (IDR): no_output + long_term flag
        bw.put(0); bw.put(if (marking.idrLongTerm) 1 else 0)
      } else if (!isB) { // B frames are non-reference: no marking syntax
        if (!marking.adaptive) bw.put(0) // sliding window
        else {
          bw.put(1)
          marking.ops.foreach {
            case H264Decoder.UnmarkShort(d) => bw.ue(1); bw.ue(d)
            case H264Decoder.UnmarkLong(n) => bw.ue(2); bw.ue(n)
            case H264Decoder.ShortToLong(d, i) => bw.ue(3); bw.ue(d); bw.ue(i)
            case H264Decoder.SetMaxLt(m) => bw.ue(4); bw.ue(m)
            case H264Decoder.ResetAll => bw.ue(5)
            case H264Decoder.CurrToLong(i) => bw.ue(6); bw.ue(i)
          }
          bw.ue(0) // end of MMCO list
        }
      }
      bw.se(qp - pps.picInitQp) // slice_qp_delta
      bw.ue(deblockIdc) // disable_deblocking_filter_idc
      if (deblockIdc != 1) { bw.se(0); bw.se(0) }

      var skipRun = 0
      var mb = mbStart
      while (mb < mbEnd) {
        val mbX = mb % wMb
        val mbY = mb / wMb
        if ((isP && trySkip(mbX, mbY, srcY, srcCb, srcCr)) ||
          (isB && tryBSkip(mbX, mbY, srcY, srcCb, srcCr))) {
          skipRun += 1
        } else {
          if (inter) { bw.ue(skipRun); skipRun = 0 }
          if (inter && mb % 7 == 3) {
            bstate.setIntraMb(mbX, mbY)
            encodeI16(bw, mbX, mbY, srcY, srcCb, srcCr,
              mbTypeOffset = if (isB) 23 else 5)
          } else if (isB) {
            encodeBMb(bw, mbX, mbY, srcY, srcCb, srcCr)
          } else if (isP) {
            encodeInterMb(bw, mbX, mbY, srcY, srcCb, srcCr)
          } else if (cfg.pcmEvery > 0 && mb % cfg.pcmEvery == 0) {
            bstate.setIntraMb(mbX, mbY)
            encodePcm(bw, mbX, mbY, srcY, srcCb, srcCr)
            mbQp(mb) = 0 // §8.7: I_PCM deblocks with QPY = 0
          } else if ((mbX + mbY) % 2 == 0) {
            bstate.setIntraMb(mbX, mbY)
            encodeI16(bw, mbX, mbY, srcY, srcCb, srcCr, mbTypeOffset = 0)
          } else {
            bstate.setIntraMb(mbX, mbY)
            encodeI4(bw, mbX, mbY, srcY, srcCb, srcCr)
          }
        }
        mb += 1
      }
      if (inter && skipRun > 0) bw.ue(skipRun)
      bw.rbspTrailing()
      Nal.unit(if (isB) 0 else 3, if (idr) 5 else 1, bw.toBytes)
    }

    /** Deblock, then return (cropped output frame, padded reference). */
    def finishFrame(): (H264Decoder.Frame, H264Decoder.RefFrame) = {
      if (cfg.deblock)
        Deblock.filterFramePerMb(y, cbP, crP, wMb, hMb, mbQp, 0, cfg.crQpOffset,
          new Array[Int](wMb * hMb), new Array[Int](wMb * hMb),
          Array.fill(wMb * hMb)(deblockIdc), bstate.mbSliceOf,
          bstate.boundaryStrength(tcY))
      val w = sps.width; val h = sps.height
      val oy = new Array[Int](w * h)
      var yy = 0
      while (yy < h) { System.arraycopy(y, yy * ls, oy, yy * w, w); yy += 1 }
      val cw = w / 2; val chh = h / 2
      val ocb = new Array[Int](cw * chh); val ocr = new Array[Int](cw * chh)
      yy = 0
      while (yy < chh) {
        System.arraycopy(cbP, yy * cs, ocb, yy * cw, cw)
        System.arraycopy(crP, yy * cs, ocr, yy * cw, cw)
        yy += 1
      }
      (H264Decoder.Frame(w, h, oy, ocb, ocr),
        H264Decoder.RefFrame(y, cbP, crP))
    }

    // ------------------------------------------------------------ inter

    /** Quantize the full-MB residual against a given prediction; returns
      * (luma scans ×16, cbpLuma, chroma code) without writing bits.
      */
    private def quantizeMb(predY: Array[Int], predCb: Array[Int], predCr: Array[Int],
        mbX: Int, mbY: Int, srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int])
        : (Array[Array[Int]], Int, ChromaCode) = {
      val x0 = mbX * 16; val y0 = mbY * 16
      val scans = new Array[Array[Int]](16)
      var cbpLuma = 0
      var i = 0
      while (i < 16) {
        val r = new Array[Int](16)
        for (yy <- 0 until 4; xx <- 0 until 4) {
          val px = blkX(i) * 4 + xx; val py = blkY(i) * 4 + yy
          r(yy * 4 + xx) = srcY((y0 + py) * ls + x0 + px) - predY(py * 16 + px)
        }
        val q = Transform.quant4x4(Transform.forward4x4(r), qp, skipDc = false)
        scans(i) = zigzag(q, 0)
        if (scans(i).exists(_ != 0)) cbpLuma |= 1 << (i >> 2)
        i += 1
      }
      // cbp groups are all-or-nothing per 8x8: zero out blocks in cleared
      // groups is a no-op (they are already zero)
      val ch = quantizeChroma(predCb, predCr, mbX, mbY, srcCb, srcCr)
      (scans, cbpLuma, ch)
    }

    private def mbPredFromMc(mbX: Int, mbY: Int,
        parts: Seq[(Int, Int, Int, Int)], refIdxs: Seq[Int],
        mvs: Seq[(Int, Int)]): (Array[Int], Array[Int], Array[Int]) = {
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      parts.indices.foreach { pi =>
        val (px, py, pw, ph) = parts(pi)
        val (mvx, mvy) = mvs(pi)
        partPredInto(predY, predCb, predCr, mbX, mbY, px, py, pw, ph,
          Seq((0, refIdxs(pi), mvx, mvy)))
      }
      (predY, predCb, predCr)
    }

    /** Write one partition's (possibly bi-) prediction into MB-local
      * buffers; two list predictions average per §8.4.2.1.
      */
    private def partPredInto(predY: Array[Int], predCb: Array[Int],
        predCr: Array[Int], mbX: Int, mbY: Int,
        px: Int, py: Int, pw: Int, ph: Int,
        preds: Seq[(Int, Int, Int, Int)]): Unit = {
      val x0 = mbX * 16 + px; val y0 = mbY * 16 + py
      val cw = pw / 2; val chh = ph / 2
      val parts = preds.map { case (list, ref, mvx, mvy) =>
        val rf = refOf(list, ref)
        (Interp.lumaBlock(rf.y, ls, hPix, 4 * x0 + mvx, 4 * y0 + mvy, pw, ph),
          Interp.chromaBlock(rf.cb, cs, hcPix, 4 * x0 + mvx, 4 * y0 + mvy, cw, chh),
          Interp.chromaBlock(rf.cr, cs, hcPix, 4 * x0 + mvx, 4 * y0 + mvy, cw, chh))
      }
      val (l0, c0, r0) = parts.head
      val (l1, c1, r1) = if (parts.size == 2) parts(1) else (null, null, null)
      val unweighted = explicitW.isEmpty && (!implicitW || parts.size == 1)
      if (unweighted) {
        // fast path (no closures per pixel): copy or §8.4.2.1 average
        for (j <- 0 until ph; i <- 0 until pw) {
          val k = j * pw + i
          predY((py + j) * 16 + px + i) =
            if (l1 == null) l0(k) else (l0(k) + l1(k) + 1) >> 1
        }
        for (j <- 0 until chh; i <- 0 until cw) {
          val k = j * cw + i
          predCb((py / 2 + j) * 8 + px / 2 + i) =
            if (c1 == null) c0(k) else (c0(k) + c1(k) + 1) >> 1
          predCr((py / 2 + j) * 8 + px / 2 + i) =
            if (r1 == null) r0(k) else (r0(k) + r1(k) + 1) >> 1
        }
        return
      }
      val (mixY, mixCb, mixCr) = Weighting.mixers(
        preds.map(p => (p._1, p._2)), explicitW, implicitW, poc,
        (list, ref) => (if (list == 0) refs0 else refs1)(ref).poc,
        (list, ref) => (if (list == 0) refs0 else refs1)(ref).longTerm)
      @inline def pxOf(b: Array[Int], i: Int): Int = if (b == null) 0 else b(i)
      for (j <- 0 until ph; i <- 0 until pw)
        predY((py + j) * 16 + px + i) = mixY(l0(j * pw + i), pxOf(l1, j * pw + i))
      for (j <- 0 until chh; i <- 0 until cw) {
        predCb((py / 2 + j) * 8 + px / 2 + i) = mixCb(c0(j * cw + i), pxOf(c1, j * cw + i))
        predCr((py / 2 + j) * 8 + px / 2 + i) = mixCr(r0(j * cw + i), pxOf(r1, j * cw + i))
      }
    }

    /** P_Skip attempt: succeeds iff the skip-MV prediction quantizes to a
      * fully zero residual; reconstructs and updates state on success.
      */
    private def trySkip(mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Boolean = {
      val (mvx, mvy) = MvPred.skipMv(bstate.neigh, mbX * 4, mbY * 4)
      val parts = Seq((0, 0, 16, 16))
      val (predY, predCb, predCr) =
        mbPredFromMc(mbX, mbY, parts, Seq(0), Seq((mvx, mvy)))
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      if (cbpLuma != 0 || ch.cbpChroma != 0) return false
      // zero residual: recon = prediction
      bstate.beginMb(mbX, mbY)
      writeMbPlanes(mbX, mbY, predY, predCb, predCr)
      bstate.setBlocks(mbX * 4, mbY * 4, 4, 4, 0, picIdOf(0, 0), mvx, mvy)
      setMbTc(mbX, mbY, 0)
      val _ = scans
      mbQp(mbY * wMb + mbX) = qp
      true
    }

    private def writeMbPlanes(mbX: Int, mbY: Int,
        predY: Array[Int], predCb: Array[Int], predCr: Array[Int]): Unit = {
      val x0 = mbX * 16; val y0 = mbY * 16
      for (j <- 0 until 16; i <- 0 until 16)
        y((y0 + j) * ls + x0 + i) = predY(j * 16 + i)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for (j <- 0 until 8; i <- 0 until 8) {
        cbP((cy0 + j) * cs + cx0 + i) = predCb(j * 8 + i)
        crP((cy0 + j) * cs + cx0 + i) = predCr(j * 8 + i)
      }
    }

    private def setMbTc(mbX: Int, mbY: Int, v: Int): Unit = {
      for (by <- 0 until 4; bx <- 0 until 4)
        tcY((mbY * 4 + by) * wMb * 4 + mbX * 4 + bx) = v
      for (by <- 0 until 2; bx <- 0 until 2) {
        tcCb((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = v
        tcCr((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = v
      }
    }

    /** Two-stage search around the predictor; returns the best MV in
      * quarter-pel units by luma SAD.
      */
    private val sadScratch = new Array[Int](256)

    private def searchMv(mbX: Int, mbY: Int, px: Int, py: Int, pw: Int, ph: Int,
        ref: Int, predX: Int, predY0: Int,
        srcY: Array[Int], list: Int = 0): (Int, Int) = {
      val x0 = mbX * 16 + px; val y0 = mbY * 16 + py
      val rf = refOf(list, ref)
      def sad(mvx: Int, mvy: Int): Int = {
        val p = Interp.lumaBlockInto(sadScratch, rf.y, ls, hPix,
          4 * x0 + mvx, 4 * y0 + mvy, pw, ph)
        var s = 0
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            s += math.abs(p(j * pw + i) - srcY((y0 + j) * ls + x0 + i))
            i += 1
          }
          j += 1
        }
        s
      }
      val coarse = Seq((0, 0), (4, 0), (-4, 0), (0, 4), (0, -4), (8, 0),
        (-8, 0), (0, 8), (0, -8), (4, 4), (-4, -4), (4, -4), (-4, 4),
        (16, 0), (-16, 0), (0, 16), (0, -16))
      var best = (predX, predY0)
      var bestS = sad(predX, predY0)
      coarse.foreach { case (dx, dy) =>
        val s = sad(predX + dx, predY0 + dy)
        if (s < bestS) { bestS = s; best = (predX + dx, predY0 + dy) }
      }
      // quarter/half refinement around the coarse winner
      val (cx, cy) = best
      for (dx <- -2 to 2; dy <- -2 to 2 if dx != 0 || dy != 0) {
        val s = sad(cx + dx, cy + dy)
        if (s < bestS) { bestS = s; best = (cx + dx, cy + dy) }
      }
      best
    }

    private def encodeInterMb(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      bstate.beginMb(mbX, mbY)
      if ((mbX + mbY) % 4 == 3) { encodeP8x8(bw, mbX, mbY, srcY, srcCb, srcCr); return }
      val (mbType, parts, shapes) = (mbX + mbY) % 4 match {
        case 0 => (0, Seq((0, 0, 16, 16)), Seq(' '))
        case 1 => (1, Seq((0, 0, 16, 8), (0, 8, 16, 8)), Seq('T', 'B'))
        case _ => (2, Seq((0, 0, 8, 16), (8, 0, 8, 16)), Seq('L', 'R'))
      }
      val refIdxs = parts.indices.map { pi =>
        if (numRefActive0 >= 2 && (mbX + mbY + pi) % 3 == 2) 1 else 0
      }
      // per partition in order: predict → search → commit state
      val mvds = new Array[(Int, Int)](parts.size)
      val mvs = new Array[(Int, Int)](parts.size)
      parts.indices.foreach { pi =>
        val (px, py, pw, ph) = parts(pi)
        val bx = mbX * 4 + px / 4
        val by = mbY * 4 + py / 4
        val (prX, prY) = MvPred.predict(bstate.neigh, bx, by, pw / 4,
          refIdxs(pi), shapes(pi))
        val (mvx, mvy) = searchMv(mbX, mbY, px, py, pw, ph, refIdxs(pi), prX, prY, srcY)
        mvs(pi) = (mvx, mvy)
        mvds(pi) = (mvx - prX, mvy - prY)
        bstate.setBlocks(bx, by, pw / 4, ph / 4, refIdxs(pi),
          picIdOf(0, refIdxs(pi)), mvx, mvy)
      }
      val (predY, predCb, predCr) = mbPredFromMc(mbX, mbY, parts, refIdxs, mvs)
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      val cbp = cbpLuma | (ch.cbpChroma << 4)

      // bitstream: mb_type, ref_idx*, mvd*, cbp, qp_delta, residual
      bw.ue(mbType)
      refIdxs.foreach { r =>
        if (numRefActive0 == 2) bw.put(1 - r)
        else if (numRefActive0 > 2) bw.ue(r)
      }
      mvds.foreach { case (dx, dy) => bw.se(dx); bw.se(dy) }
      bw.ue(H264Decoder.CbpInterInv(cbp))
      if (cbp != 0) bw.se(0) // mb_qp_delta

      // residual blocks + tc bookkeeping (parse order)
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i); val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val tc = Cavlc.encodeBlock(bw, scans(i), lumaNC(gbx, gby))
          tcY(gby * wMb * 4 + gbx) = tc
        } else tcY(gby * wMb * 4 + gbx) = 0
        i += 1
      }
      writeChromaResidual(bw, mbX, mbY, ch)

      // reconstruction: prediction + normative inverse residual
      writeMbPlanes(mbX, mbY, predY, predCb, predCr)
      i = 0
      while (i < 16) {
        val res = Transform.inverse4x4(
          Transform.dequant4x4(unzigzag16(scans(i)), qp, skipDc = false))
        addResidualAt(y, ls, mbX * 16 + blkX(i) * 4, mbY * 16 + blkY(i) * 4, res)
        i += 1
      }
      reconChromaOnto(mbX, mbY, ch)
      mbQp(mbY * wMb + mbX) = qp
    }

    /** P_8x8: sub_mb_types cycle per 8×8 so every fixture carries
      * 8×8 / 8×4 / 4×8 / 4×4 motion; ref_idx per 8×8, search + mvd per
      * sub-partition in parse order with immediate state commits.
      */
    private def encodeP8x8(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      def subGeom(t: Int): Seq[(Int, Int, Int, Int)] = t match {
        case 0 => Seq((0, 0, 8, 8))
        case 1 => Seq((0, 0, 8, 4), (0, 4, 8, 4))
        case 2 => Seq((0, 0, 4, 8), (4, 0, 4, 8))
        case _ => Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4))
      }
      val subTypes = (0 until 4).map(e8 => (mbX + e8) % 4)
      val refIdxs = (0 until 4).map { e8 =>
        if (numRefActive0 >= 2 && (mbX + mbY + e8) % 3 == 2) 1 else 0
      }
      // per-sub search in parse order, committing state as we go
      val parts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
      val partRefs = scala.collection.mutable.ArrayBuffer.empty[Int]
      val partMvs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val mvds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (e8 <- 0 until 4) {
        val ox = (e8 & 1) * 8; val oy = (e8 >> 1) * 8
        subGeom(subTypes(e8)).foreach { case (sx, sy, sw, sh) =>
          val px = ox + sx; val py = oy + sy
          val bx = mbX * 4 + px / 4
          val by = mbY * 4 + py / 4
          val (prX, prY) = MvPred.predict(bstate.neigh, bx, by, sw / 4, refIdxs(e8))
          val (mvx, mvy) = searchMv(mbX, mbY, px, py, sw, sh, refIdxs(e8), prX, prY, srcY)
          bstate.setBlocks(bx, by, sw / 4, sh / 4, refIdxs(e8),
            picIdOf(0, refIdxs(e8)), mvx, mvy)
          parts += ((px, py, sw, sh))
          partRefs += refIdxs(e8)
          partMvs += ((mvx, mvy))
          mvds += ((mvx - prX, mvy - prY))
        }
      }
      val (predY, predCb, predCr) =
        mbPredFromMc(mbX, mbY, parts.toSeq, partRefs.toSeq, partMvs.toSeq)
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      val cbp = cbpLuma | (ch.cbpChroma << 4)

      bw.ue(3) // P_8x8
      subTypes.foreach(bw.ue)
      refIdxs.foreach { r =>
        if (numRefActive0 == 2) bw.put(1 - r)
        else if (numRefActive0 > 2) bw.ue(r)
      }
      mvds.foreach { case (dx, dy) => bw.se(dx); bw.se(dy) }
      bw.ue(H264Decoder.CbpInterInv(cbp))
      if (cbp != 0) bw.se(0)

      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i); val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val tc = Cavlc.encodeBlock(bw, scans(i), lumaNC(gbx, gby))
          tcY(gby * wMb * 4 + gbx) = tc
        } else tcY(gby * wMb * 4 + gbx) = 0
        i += 1
      }
      writeChromaResidual(bw, mbX, mbY, ch)

      writeMbPlanes(mbX, mbY, predY, predCb, predCr)
      i = 0
      while (i < 16) {
        val res = Transform.inverse4x4(
          Transform.dequant4x4(unzigzag16(scans(i)), qp, skipDc = false))
        addResidualAt(y, ls, mbX * 16 + blkX(i) * 4, mbY * 16 + blkY(i) * 4, res)
        i += 1
      }
      reconChromaOnto(mbX, mbY, ch)
      mbQp(mbY * wMb + mbX) = qp
    }

    // ------------------------------------------------------------ B MBs

    /** Direct motion for this MB (shared [[BDirect]] derivation, spatial
      * or temporal per config; co-located picture = RefPicList1[0]).
      */
    private def directMotion(mbX: Int, mbY: Int): BDirect.DirectMotion = {
      val colM = refs1.head.motion
      val w4 = wMb * 4
      val col: Int => BDirect.ColBlock = blk => {
        val i = (mbY * 4 + (blk >> 2)) * w4 + mbX * 4 + (blk & 3)
        if (colM.pic0(i) >= 0)
          BDirect.ColBlock(colM.pic0(i), colM.ref0(i), colM.mv0x(i), colM.mv0y(i))
        else if (colM.pic1(i) >= 0)
          BDirect.ColBlock(colM.pic1(i), colM.ref1(i), colM.mv1x(i), colM.mv1y(i))
        else BDirect.ColBlock(-1, -1, 0, 0)
      }
      if (!cfg.temporalDirectB)
        BDirect.spatial(bstate.neigh(0), bstate.neigh(1), mbX * 4, mbY * 4,
          col, sps.direct8x8Inference, colShortTerm = !refs1.head.longTerm)
      else
        BDirect.temporal(col,
          picId => refs0.indexWhere(_.picId == picId),
          idx => refs0(idx).poc, idx => refs0(idx).longTerm,
          refs1.head.poc, poc, sps.direct8x8Inference)
    }

    /** Build the (bi-)prediction of direct motion over selected 8×8
      * quadrants into MB-local buffers — pure (no state commit).
      */
    private def directPred(predY: Array[Int], predCb: Array[Int],
        predCr: Array[Int], mbX: Int, mbY: Int,
        dm: BDirect.DirectMotion, quadMask: Int): Unit = {
      var blk = 0
      while (blk < 16) {
        val bx = blk & 3; val by = blk >> 2
        val e8 = (by >> 1) * 2 + (bx >> 1)
        if ((quadMask & (1 << e8)) != 0) {
          val preds = Seq.newBuilder[(Int, Int, Int, Int)]
          if (dm.ref0(blk) >= 0)
            preds += ((0, dm.ref0(blk), dm.mv0x(blk), dm.mv0y(blk)))
          if (dm.ref1(blk) >= 0)
            preds += ((1, dm.ref1(blk), dm.mv1x(blk), dm.mv1y(blk)))
          partPredInto(predY, predCb, predCr, mbX, mbY, bx * 4, by * 4, 4, 4,
            preds.result())
        }
        blk += 1
      }
    }

    /** Commit direct motion to the block state (both lists). */
    private def commitDirect(mbX: Int, mbY: Int, dm: BDirect.DirectMotion,
        quadMask: Int): Unit = {
      var blk = 0
      while (blk < 16) {
        val bx = blk & 3; val by = blk >> 2
        val e8 = (by >> 1) * 2 + (bx >> 1)
        if ((quadMask & (1 << e8)) != 0) {
          val gbx = mbX * 4 + bx
          val gby = mbY * 4 + by
          if (dm.ref0(blk) >= 0)
            bstate.setBlocks(0, gbx, gby, 1, 1, dm.ref0(blk),
              picIdOf(0, dm.ref0(blk)), dm.mv0x(blk), dm.mv0y(blk))
          else bstate.setBlocks(0, gbx, gby, 1, 1, -1, -1, 0, 0)
          if (dm.ref1(blk) >= 0)
            bstate.setBlocks(1, gbx, gby, 1, 1, dm.ref1(blk),
              picIdOf(1, dm.ref1(blk)), dm.mv1x(blk), dm.mv1y(blk))
          else bstate.setBlocks(1, gbx, gby, 1, 1, -1, -1, 0, 0)
        }
        blk += 1
      }
    }

    /** B_Skip attempt: direct motion with a fully-zero quantized
      * residual; commits state only on success.
      */
    private def tryBSkip(mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Boolean = {
      val dm = directMotion(mbX, mbY)
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      directPred(predY, predCb, predCr, mbX, mbY, dm, 0xF)
      val (_, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      if (cbpLuma != 0 || ch.cbpChroma != 0) return false
      bstate.beginMb(mbX, mbY)
      commitDirect(mbX, mbY, dm, 0xF)
      writeMbPlanes(mbX, mbY, predY, predCb, predCr)
      setMbTc(mbX, mbY, 0)
      mbQp(mbY * wMb + mbX) = qp
      true
    }

    /** Inter residual tail shared by every non-skip B macroblock: write
      * cbp/qp-delta/blocks and reconstruct onto the MC prediction.
      */
    private def writeBResidualAndRecon(bw: BitWriter, mbX: Int, mbY: Int,
        predY: Array[Int], predCb: Array[Int], predCr: Array[Int],
        scans: Array[Array[Int]], cbpLuma: Int, ch: ChromaCode): Unit = {
      val cbp = cbpLuma | (ch.cbpChroma << 4)
      bw.ue(H264Decoder.CbpInterInv(cbp))
      if (cbp != 0) bw.se(0) // mb_qp_delta
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i); val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val tc = Cavlc.encodeBlock(bw, scans(i), lumaNC(gbx, gby))
          tcY(gby * wMb * 4 + gbx) = tc
        } else tcY(gby * wMb * 4 + gbx) = 0
        i += 1
      }
      writeChromaResidual(bw, mbX, mbY, ch)
      writeMbPlanes(mbX, mbY, predY, predCb, predCr)
      i = 0
      while (i < 16) {
        val res = Transform.inverse4x4(
          Transform.dequant4x4(unzigzag16(scans(i)), qp, skipDc = false))
        addResidualAt(y, ls, mbX * 16 + blkX(i) * 4, mbY * 16 + blkY(i) * 4, res)
        i += 1
      }
      reconChromaOnto(mbX, mbY, ch)
      mbQp(mbY * wMb + mbX) = qp
    }

    /** One B macroblock, cycling through every family: direct-with-
      * residual, Bi/L0/L1 16×16, a mixed-list 16×8, and B_8x8 with
      * direct / Bi / 8×4 / 4×4 sub-partitions.
      */
    private def encodeBMb(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      bstate.beginMb(mbX, mbY)
      (mbX + mbY) % 6 match {
        case 0 => encodeBDirect16(bw, mbX, mbY, srcY, srcCb, srcCr)
        case 1 => encodeB16x16(bw, mbX, mbY, srcY, srcCb, srcCr, use = 3)
        case 2 => encodeB16x16(bw, mbX, mbY, srcY, srcCb, srcCr, use = 1)
        case 3 => encodeB16x16(bw, mbX, mbY, srcY, srcCb, srcCr, use = 2)
        case 4 => encodeB16x8L0L1(bw, mbX, mbY, srcY, srcCb, srcCr)
        case _ => encodeB8x8(bw, mbX, mbY, srcY, srcCb, srcCr)
      }
    }

    private def encodeBDirect16(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val dm = directMotion(mbX, mbY)
      commitDirect(mbX, mbY, dm, 0xF)
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      directPred(predY, predCb, predCr, mbX, mbY, dm, 0xF)
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      bw.ue(0) // B_Direct_16x16
      writeBResidualAndRecon(bw, mbX, mbY, predY, predCb, predCr, scans, cbpLuma, ch)
    }

    /** 16×16 with `use` bit 0 = L0, bit 1 = L1 (mb_type 1/2/3). */
    private def encodeB16x16(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int], use: Int): Unit = {
      val bx = mbX * 4; val by = mbY * 4
      val preds = Seq.newBuilder[(Int, Int, Int, Int)]
      val mvds = Seq.newBuilder[(Int, Int, Int)] // (list, dx, dy)
      val refBits = Seq.newBuilder[(Int, Int)] // (list, ref)
      for (list <- 0 to 1) {
        if ((use & (1 << list)) != 0) {
          val active = if (list == 0) numRefActive0 else numRefActive1
          val r = if (list == 0 && active >= 2 && (mbX * 3 + mbY) % 4 == 1) 1 else 0
          val (prX, prY) = MvPred.predict(bstate.neigh(list), bx, by, 4, r)
          val (mvx, mvy) = searchMv(mbX, mbY, 0, 0, 16, 16, r, prX, prY, srcY, list)
          bstate.setBlocks(list, bx, by, 4, 4, r, picIdOf(list, r), mvx, mvy)
          refBits += ((list, r))
          mvds += ((list, mvx - prX, mvy - prY))
          preds += ((list, r, mvx, mvy))
        } else {
          bstate.setBlocks(list, bx, by, 4, 4, -1, -1, 0, 0)
        }
      }
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      partPredInto(predY, predCb, predCr, mbX, mbY, 0, 0, 16, 16, preds.result())
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      bw.ue(use match { case 1 => 1; case 2 => 2; case _ => 3 })
      refBits.result().foreach { case (list, r) =>
        val active = if (list == 0) numRefActive0 else numRefActive1
        if (active == 2) bw.put(1 - r)
        else if (active > 2) bw.ue(r)
      }
      mvds.result().foreach { case (_, dx, dy) => bw.se(dx); bw.se(dy) }
      writeBResidualAndRecon(bw, mbX, mbY, predY, predCb, predCr, scans, cbpLuma, ch)
    }

    /** B_L0_L1_16x8 (mb_type 8): top partition L0, bottom L1. */
    private def encodeB16x8L0L1(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      // partition 0: L0, shape 'T'
      val (pr0x, pr0y) = MvPred.predict(bstate.neigh(0), mbX * 4, mbY * 4, 4, 0, 'T')
      val (m0x, m0y) = searchMv(mbX, mbY, 0, 0, 16, 8, 0, pr0x, pr0y, srcY, 0)
      bstate.setBlocks(0, mbX * 4, mbY * 4, 4, 2, 0, picIdOf(0, 0), m0x, m0y)
      bstate.setBlocks(1, mbX * 4, mbY * 4, 4, 2, -1, -1, 0, 0)
      partPredInto(predY, predCb, predCr, mbX, mbY, 0, 0, 16, 8,
        Seq((0, 0, m0x, m0y)))
      // partition 1: L1, shape 'B'
      val (pr1x, pr1y) = MvPred.predict(bstate.neigh(1), mbX * 4, mbY * 4 + 2, 4, 0, 'B')
      val (m1x, m1y) = searchMv(mbX, mbY, 0, 8, 16, 8, 0, pr1x, pr1y, srcY, 1)
      bstate.setBlocks(1, mbX * 4, mbY * 4 + 2, 4, 2, 0, picIdOf(1, 0), m1x, m1y)
      bstate.setBlocks(0, mbX * 4, mbY * 4 + 2, 4, 2, -1, -1, 0, 0)
      partPredInto(predY, predCb, predCr, mbX, mbY, 0, 8, 16, 8,
        Seq((1, 0, m1x, m1y)))
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      bw.ue(8) // B_L0_L1_16x8
      if (numRefActive0 == 2) bw.put(1) else if (numRefActive0 > 2) bw.ue(0)
      if (numRefActive1 == 2) bw.put(1) else if (numRefActive1 > 2) bw.ue(0)
      bw.se(m0x - pr0x); bw.se(m0y - pr0y)
      bw.se(m1x - pr1x); bw.se(m1y - pr1y)
      writeBResidualAndRecon(bw, mbX, mbY, predY, predCb, predCr, scans, cbpLuma, ch)
    }

    /** B_8x8 with sub_mb_types cycling direct / Bi 8×8 / L0 8×4 /
      * L1 4×4 — exercises the B sub-partition parse order end to end.
      */
    private def encodeB8x8(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val subTypes = (0 until 4).map(e8 => Seq(0, 3, 4, 11)((mbX + e8) % 4))
      def subGeom(t: Int): (Seq[(Int, Int, Int, Int)], Int) = t match {
        case 3 => (Seq((0, 0, 8, 8)), 3)
        case 4 => (Seq((0, 0, 8, 4), (0, 4, 8, 4)), 1)
        case 11 => (Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)), 2)
        case _ => (Seq.empty, 0) // direct
      }
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64)
      val predCr = new Array[Int](64)
      lazy val dm = directMotion(mbX, mbY)
      val mvd0 = Array.fill(4)(Seq.empty[(Int, Int)])
      val mvd1 = Array.fill(4)(Seq.empty[(Int, Int)])
      for (e8 <- 0 until 4) {
        val ox = (e8 & 1) * 8; val oy = (e8 >> 1) * 8
        if (subTypes(e8) == 0) {
          commitDirect(mbX, mbY, dm, 1 << e8)
          directPred(predY, predCb, predCr, mbX, mbY, dm, 1 << e8)
        } else {
          val (geom, usage) = subGeom(subTypes(e8))
          val d0 = Seq.newBuilder[(Int, Int)]
          val d1 = Seq.newBuilder[(Int, Int)]
          geom.foreach { case (sx, sy, sw, sh) =>
            val px = ox + sx; val py = oy + sy
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            val preds = Seq.newBuilder[(Int, Int, Int, Int)]
            for (list <- 0 to 1) {
              if ((usage & (1 << list)) != 0) {
                val (prX, prY) = MvPred.predict(bstate.neigh(list), bx, by, sw / 4, 0)
                val (mvx, mvy) = searchMv(mbX, mbY, px, py, sw, sh, 0, prX, prY, srcY, list)
                bstate.setBlocks(list, bx, by, sw / 4, sh / 4, 0,
                  picIdOf(list, 0), mvx, mvy)
                preds += ((list, 0, mvx, mvy))
                if (list == 0) d0 += ((mvx - prX, mvy - prY))
                else d1 += ((mvx - prX, mvy - prY))
              } else {
                bstate.setBlocks(list, bx, by, sw / 4, sh / 4, -1, -1, 0, 0)
              }
            }
            partPredInto(predY, predCb, predCr, mbX, mbY, px, py, sw, sh,
              preds.result())
          }
          mvd0(e8) = d0.result()
          mvd1(e8) = d1.result()
        }
      }
      val (scans, cbpLuma, ch) =
        quantizeMb(predY, predCb, predCr, mbX, mbY, srcY, srcCb, srcCr)
      bw.ue(22) // B_8x8
      subTypes.foreach(bw.ue)
      // ref_idx_l0 per 8x8 using L0, then l1 (all our sub-refs are 0)
      for (e8 <- 0 until 4; if (subGeom(subTypes(e8))._2 & 1) != 0) {
        if (numRefActive0 == 2) bw.put(1) else if (numRefActive0 > 2) bw.ue(0)
      }
      for (e8 <- 0 until 4; if (subGeom(subTypes(e8))._2 & 2) != 0) {
        if (numRefActive1 == 2) bw.put(1) else if (numRefActive1 > 2) bw.ue(0)
      }
      for (e8 <- 0 until 4) mvd0(e8).foreach { case (dx, dy) => bw.se(dx); bw.se(dy) }
      for (e8 <- 0 until 4) mvd1(e8).foreach { case (dx, dy) => bw.se(dx); bw.se(dy) }
      writeBResidualAndRecon(bw, mbX, mbY, predY, predCb, predCr, scans, cbpLuma, ch)
    }

    // ----------------------------------------------------------- PCM

    private def encodePcm(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      bw.ue(25)
      bw.alignZero() // pcm_alignment_zero_bit
      val x0 = mbX * 16; val y0 = mbY * 16
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val v = srcY((y0 + yy) * ls + x0 + xx)
        bw.putBits(v, 8); y((y0 + yy) * ls + x0 + xx) = v
      }
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val v = srcCb((cy0 + yy) * cs + cx0 + xx)
        bw.putBits(v, 8); cbP((cy0 + yy) * cs + cx0 + xx) = v
      }
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val v = srcCr((cy0 + yy) * cs + cx0 + xx)
        bw.putBits(v, 8); crP((cy0 + yy) * cs + cx0 + xx) = v
      }
      setMbTc(mbX, mbY, 16)
    }

    // ------------------------------------------------------- helpers

    private def gatherEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
        n: Int, mbX: Int, mbY: Int): (Array[Int], Array[Int], Int, Boolean, Boolean) = {
      val availU = y0 > 0 && bstate.mbAvail(mbX, mbY - 1)
      val availL = x0 > 0 && bstate.mbAvail(mbX - 1, mbY)
      val u = new Array[Int](n)
      val l = new Array[Int](n)
      var c = 128
      if (availU) { var i = 0; while (i < n) { u(i) = plane((y0 - 1) * stride + x0 + i); i += 1 } }
      if (availL) { var i = 0; while (i < n) { l(i) = plane((y0 + i) * stride + x0 - 1); i += 1 } }
      val cAvail = availU && availL && bstate.mbAvail(mbX - 1, mbY - 1)
      if (cAvail) c = plane((y0 - 1) * stride + x0 - 1)
      else if (availU) c = u(0)
      else if (availL) c = l(0)
      (u, l, c, availU, availL)
    }

    private def mortonLt(bx: Int, by: Int, cx: Int, cy: Int): Boolean = {
      def code(x: Int, yy: Int) =
        ((yy >> 1) << 3) | ((x >> 1) << 2) | ((yy & 1) << 1) | (x & 1)
      code(bx, by) < code(cx, cy)
    }

    private def lumaNeighbors(sx: Int, sy: Int, mbX: Int, mbY: Int,
        blkIdx: Int): (Array[Int], Array[Int], Int, Boolean, Boolean) = {
      val availU = sy > 0 && bstate.mbAvail(sx / 16, (sy - 1) / 16)
      val availL = sx > 0 && bstate.mbAvail((sx - 1) / 16, sy / 16)
      val u = new Array[Int](8)
      val l = new Array[Int](4)
      var c = 128
      if (availU) {
        var i = 0
        while (i < 4) { u(i) = y((sy - 1) * ls + sx + i); i += 1 }
        val urAvail = sx + 4 < ls && bstate.mbAvail((sx + 4) / 16, (sy - 1) / 16) && {
          val nMbX = (sx + 4) / 16; val nMbY = (sy - 1) / 16
          if (nMbY < mbY) true
          else if (nMbX != mbX) nMbX < mbX
          else mortonLt((sx + 4) / 4 - mbX * 4, (sy - 1) / 4 - mbY * 4,
            blkX(blkIdx), blkY(blkIdx))
        }
        if (urAvail) { var i = 4; while (i < 8) { u(i) = y((sy - 1) * ls + sx + i); i += 1 } }
        else { var i = 4; while (i < 8) { u(i) = u(3); i += 1 } }
      }
      if (availL) { var i = 0; while (i < 4) { l(i) = y((sy + i) * ls + sx - 1); i += 1 } }
      val cAvail = availU && availL && bstate.mbAvail((sx - 1) / 16, (sy - 1) / 16)
      if (cAvail) c = y((sy - 1) * ls + sx - 1)
      else if (availU) c = u(0)
      else if (availL) c = l(0)
      (u, l, c, availU, availL)
    }

    private def lumaNC(gbx: Int, gby: Int): Int = {
      val a = gbx > 0 && bstate.mbAvail((gbx - 1) / 4, gby / 4)
      val b = gby > 0 && bstate.mbAvail(gbx / 4, (gby - 1) / 4)
      if (a && b) (tcY(gby * wMb * 4 + gbx - 1) + tcY((gby - 1) * wMb * 4 + gbx) + 1) >> 1
      else if (a) tcY(gby * wMb * 4 + gbx - 1)
      else if (b) tcY((gby - 1) * wMb * 4 + gbx)
      else 0
    }

    private def chromaNC(tc: Array[Int], gbx: Int, gby: Int): Int = {
      val a = gbx > 0 && bstate.mbAvail((gbx - 1) / 2, gby / 2)
      val b = gby > 0 && bstate.mbAvail(gbx / 2, (gby - 1) / 2)
      if (a && b) (tc(gby * wMb * 2 + gbx - 1) + tc((gby - 1) * wMb * 2 + gbx) + 1) >> 1
      else if (a) tc(gby * wMb * 2 + gbx - 1)
      else if (b) tc((gby - 1) * wMb * 2 + gbx)
      else 0
    }

    private def zigzag(raster: Array[Int], from: Int): Array[Int] = {
      val out = new Array[Int](16 - from)
      var i = from
      while (i < 16) { out(i - from) = raster(Transform.Zigzag(i)); i += 1 }
      out
    }

    private def addResidualAt(plane: Array[Int], stride: Int, x0: Int, y0: Int,
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

    private def addResidual(plane: Array[Int], stride: Int, x0: Int, y0: Int,
        pred: Array[Int], res: Array[Int]): Unit = {
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          plane((y0 + yy) * stride + x0 + xx) =
            Transform.clip255(pred(yy * 4 + xx) + res(yy * 4 + xx))
          xx += 1
        }
        yy += 1
      }
    }

    private def residual4x4(src: Array[Int], stride: Int, x0: Int, y0: Int,
        pred: Array[Int]): Array[Int] = {
      val r = new Array[Int](16)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          r(yy * 4 + xx) = src((y0 + yy) * stride + x0 + xx) - pred(yy * 4 + xx)
          xx += 1
        }
        yy += 1
      }
      r
    }

    private def extract4x4(plane: Array[Int], stride: Int, x0: Int, y0: Int): Array[Int] = {
      val out = new Array[Int](16)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) { out(yy * 4 + xx) = plane((y0 + yy) * stride + x0 + xx); xx += 1 }
        yy += 1
      }
      out
    }

    // -------------------------------------------------------- I_16x16

    private def encodeI16(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int],
        mbTypeOffset: Int): Unit = {
      val x0 = mbX * 16; val y0 = mbY * 16
      val (u, l, c, aU, aL) = gatherEdge(y, ls, x0, y0, 16, mbX, mbY)
      val candidates = Seq(2) ++
        (if (aU) Seq(0) else Nil) ++ (if (aL) Seq(1) else Nil) ++
        (if (aU && aL) Seq(3) else Nil)
      val pred = new Array[Int](256) // 16x16, stride 16
      var bestMode = 2
      var bestSad = Int.MaxValue
      candidates.foreach { m =>
        Predict.luma16x16(m, pred, 16, 0, 0, u, l, c, aU, aL)
        var s = 0
        for (yy <- 0 until 16; xx <- 0 until 16)
          s += math.abs(pred(yy * 16 + xx) - srcY((y0 + yy) * ls + x0 + xx))
        if (s < bestSad) { bestSad = s; bestMode = m }
      }
      Predict.luma16x16(bestMode, pred, 16, 0, 0, u, l, c, aU, aL)

      val acScan = new Array[Array[Int]](16)
      val dcRaster = new Array[Int](16)
      val wBlocks = new Array[Array[Int]](16)
      val preds = new Array[Array[Int]](16)
      var i = 0
      while (i < 16) {
        val bx = x0 + blkX(i) * 4; val by = y0 + blkY(i) * 4
        val p4 = extract4x4(pred, 16, blkX(i) * 4, blkY(i) * 4)
        preds(i) = p4
        val w = Transform.forward4x4(residual4x4(srcY, ls, bx, by, p4))
        wBlocks(i) = w
        dcRaster(blkY(i) * 4 + blkX(i)) = w(0)
        i += 1
      }
      val dcScan = zigzag(Transform.quantLumaDc(dcRaster, qp), 0)
      i = 0
      var anyAc = false
      while (i < 16) {
        val q = Transform.quant4x4(wBlocks(i), qp, skipDc = true)
        acScan(i) = zigzag(q, 1)
        if (acScan(i).exists(_ != 0)) anyAc = true
        i += 1
      }
      val cbpLuma = if (anyAc) 15 else 0

      val ch = encodeChromaIntra(mbX, mbY, srcCb, srcCr)

      bw.ue(mbTypeOffset + 1 + bestMode + 4 * ch.cbpChroma +
        12 * (if (cbpLuma == 15) 1 else 0))
      bw.ue(0) // intra_chroma_pred_mode: DC
      bw.se(0) // mb_qp_delta

      Cavlc.encodeBlock(bw, dcScan, lumaNC(mbX * 4, mbY * 4))
      i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i); val gby = mbY * 4 + blkY(i)
        if (cbpLuma != 0) {
          val tc = Cavlc.encodeBlock(bw, acScan(i), lumaNC(gbx, gby))
          tcY(gby * wMb * 4 + gbx) = tc
        } else tcY(gby * wMb * 4 + gbx) = 0
        i += 1
      }
      writeChromaResidual(bw, mbX, mbY, ch)

      val dcScaled = Transform.dequantLumaDc(unzigzag16(dcScan), qp)
      i = 0
      while (i < 16) {
        val bx = x0 + blkX(i) * 4; val by = y0 + blkY(i) * 4
        val raster = unzigzagAc(acScan(i))
        val scaled = Transform.dequant4x4(raster, qp, skipDc = true)
        scaled(0) = dcScaled(blkY(i) * 4 + blkX(i))
        addResidual(y, ls, bx, by, preds(i), Transform.inverse4x4(scaled))
        i += 1
      }
      reconChromaOnto(mbX, mbY, ch, writePred = true)
      mbQp(mbY * wMb + mbX) = qp
    }

    // --------------------------------------------------------- I_4x4

    private def encodeI4(bw: BitWriter, mbX: Int, mbY: Int,
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val modes = new Array[Int](16)
      val predFlags = new Array[Boolean](16)
      val rems = new Array[Int](16)
      val scans = new Array[Array[Int]](16)

      var i = 0
      while (i < 16) {
        val sx = mbX * 16 + blkX(i) * 4
        val sy = mbY * 16 + blkY(i) * 4
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        val (u, l, c, aU, aL) = lumaNeighbors(sx, sy, mbX, mbY, i)
        val candidates = Seq(2) ++
          (if (aU) Seq(0, 3, 7) else Nil) ++ (if (aL) Seq(1, 8) else Nil) ++
          (if (aU && aL) Seq(4, 5, 6) else Nil)
        val scratch = new Array[Int](16) // 4x4, stride 4
        var bestMode = 2
        var bestSad = Int.MaxValue
        candidates.foreach { m =>
          Predict.luma4x4(m, scratch, 4, 0, 0, u, l, c, aU, aL)
          var s = 0
          for (yy <- 0 until 4; xx <- 0 until 4)
            s += math.abs(scratch(yy * 4 + xx) - srcY((sy + yy) * ls + sx + xx))
          if (s < bestSad) { bestSad = s; bestMode = m }
        }
        Predict.luma4x4(bestMode, scratch, 4, 0, 0, u, l, c, aU, aL)
        val p4 = scratch.clone()
        modes(i) = bestMode

        val predMode =
          if (!(gbx > 0 && bstate.mbAvail((gbx - 1) / 4, gby / 4)) ||
            !(gby > 0 && bstate.mbAvail(gbx / 4, (gby - 1) / 4))) 2
          else {
            val mA = i4Mode(gby * wMb * 4 + gbx - 1)
            val mB = i4Mode((gby - 1) * wMb * 4 + gbx)
            math.min(if (mA < 0) 2 else mA, if (mB < 0) 2 else mB)
          }
        predFlags(i) = bestMode == predMode
        rems(i) = if (bestMode < predMode) bestMode else bestMode - 1
        i4Mode(gby * wMb * 4 + gbx) = bestMode

        val q = Transform.quant4x4(
          Transform.forward4x4(residual4x4(srcY, ls, sx, sy, p4)), qp, skipDc = false)
        scans(i) = zigzag(q, 0)
        // reconstruct NOW — later blocks in this MB predict from these
        // samples. A cleared cbp group has all-zero quantized blocks, so
        // pred + inv(dequant(0)) = pred keeps this exact either way.
        addResidual(y, ls, sx, sy, p4, Transform.inverse4x4(
          Transform.dequant4x4(unzigzag16(scans(i)), qp, skipDc = false)))
        i += 1
      }

      var cbpLuma = 0
      var g = 0
      while (g < 4) {
        if ((g * 4 until g * 4 + 4).exists(b => scans(b).exists(_ != 0)))
          cbpLuma |= 1 << g
        g += 1
      }
      val ch = encodeChromaIntra(mbX, mbY, srcCb, srcCr)
      val cbp = cbpLuma | (ch.cbpChroma << 4)

      bw.ue(0) // mb_type I_4x4 (I-slice only path)
      i = 0
      while (i < 16) {
        if (predFlags(i)) bw.put(1)
        else { bw.put(0); bw.putBits(rems(i), 3) }
        i += 1
      }
      bw.ue(0) // intra_chroma_pred_mode: DC
      bw.ue(H264Decoder.CbpIntraInv(cbp))
      if (cbp != 0) bw.se(0) // mb_qp_delta

      i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i); val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val tc = Cavlc.encodeBlock(bw, scans(i), lumaNC(gbx, gby))
          tcY(gby * wMb * 4 + gbx) = tc
        } else tcY(gby * wMb * 4 + gbx) = 0
        i += 1
      }
      writeChromaResidual(bw, mbX, mbY, ch)
      reconChromaOnto(mbX, mbY, ch, writePred = true)
      mbQp(mbY * wMb + mbX) = qp
    }

    // -------------------------------------------------------- chroma

    private final case class ChromaCode(
        cbpChroma: Int,
        dcCbScan: Array[Int], dcCrScan: Array[Int],
        acCb: Array[Array[Int]], acCr: Array[Array[Int]],
        predCb: Array[Int], predCr: Array[Int]) // 8x8 row-major preds

    /** Intra chroma (DC prediction) quantization. */
    private def encodeChromaIntra(mbX: Int, mbY: Int,
        srcCb: Array[Int], srcCr: Array[Int]): ChromaCode = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      val (uB, lB, cB, aU, aL) = gatherEdge(cbP, cs, cx0, cy0, 8, mbX, mbY)
      val (uR, lR, cR, _, _) = gatherEdge(crP, cs, cx0, cy0, 8, mbX, mbY)
      val pCb = new Array[Int](64)
      val pCr = new Array[Int](64)
      Predict.chroma8x8(0, pCb, 8, 0, 0, uB, lB, cB, aU, aL)
      Predict.chroma8x8(0, pCr, 8, 0, 0, uR, lR, cR, aU, aL)
      quantizeChromaWithPred(pCb, pCr, mbX, mbY, srcCb, srcCr)
    }

    /** Chroma quantization against motion-compensated prediction. */
    private def quantizeChroma(predCb: Array[Int], predCr: Array[Int],
        mbX: Int, mbY: Int, srcCb: Array[Int], srcCr: Array[Int]): ChromaCode =
      quantizeChromaWithPred(predCb, predCr, mbX, mbY, srcCb, srcCr)

    private def quantizeChromaWithPred(pCb: Array[Int], pCr: Array[Int],
        mbX: Int, mbY: Int, srcCb: Array[Int], srcCr: Array[Int]): ChromaCode = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      def one(src: Array[Int], pred8: Array[Int],
          qpc: Int): (Array[Int], Array[Array[Int]]) = {
        val dc = new Array[Int](4)
        val ac = new Array[Array[Int]](4)
        var b = 0
        while (b < 4) {
          val bx = cx0 + (b & 1) * 4; val by = cy0 + (b >> 1) * 4
          val p4 = new Array[Int](16)
          for (yy <- 0 until 4; xx <- 0 until 4)
            p4(yy * 4 + xx) = pred8(((b >> 1) * 4 + yy) * 8 + (b & 1) * 4 + xx)
          val w = Transform.forward4x4(residual4x4(src, cs, bx, by, p4))
          dc(b) = w(0)
          ac(b) = zigzag(Transform.quant4x4(w, qpc, skipDc = true), 1)
          b += 1
        }
        (Transform.quantChromaDc(dc, qpc), ac)
      }
      val (dcCb, acCb) = one(srcCb, pCb, qpC)
      val (dcCr, acCr) = one(srcCr, pCr, qpCr2)
      val anyAc = (acCb ++ acCr).exists(_.exists(_ != 0))
      val anyDc = dcCb.exists(_ != 0) || dcCr.exists(_ != 0)
      val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
      ChromaCode(cbpChroma, dcCb, dcCr, acCb, acCr, pCb, pCr)
    }

    private def writeChromaResidual(bw: BitWriter, mbX: Int, mbY: Int,
        ch: ChromaCode): Unit = {
      if (ch.cbpChroma > 0) {
        Cavlc.encodeBlock(bw, ch.dcCbScan, -1)
        Cavlc.encodeBlock(bw, ch.dcCrScan, -1)
      }
      for ((tc, ac) <- Seq((tcCb, ch.acCb), (tcCr, ch.acCr))) {
        var b = 0
        while (b < 4) {
          val gbx = mbX * 2 + (b & 1); val gby = mbY * 2 + (b >> 1)
          if (ch.cbpChroma == 2) {
            val t = Cavlc.encodeBlock(bw, ac(b), chromaNC(tc, gbx, gby))
            tc(gby * wMb * 2 + gbx) = t
          } else tc(gby * wMb * 2 + gbx) = 0
          b += 1
        }
      }
    }

    /** Reconstruct chroma: optionally write the prediction first (intra
      * path; the inter path already wrote MC prediction via
      * [[writeMbPlanes]]), then add the dequantized residual.
      */
    private def reconChromaOnto(mbX: Int, mbY: Int, ch: ChromaCode,
        writePred: Boolean = false): Unit = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      if (writePred) {
        for (j <- 0 until 8; i <- 0 until 8) {
          cbP((cy0 + j) * cs + cx0 + i) = ch.predCb(j * 8 + i)
          crP((cy0 + j) * cs + cx0 + i) = ch.predCr(j * 8 + i)
        }
      }
      def one(plane: Array[Int], dcScan: Array[Int], ac: Array[Array[Int]],
          qpc: Int): Unit = {
        val dcScaled =
          if (ch.cbpChroma > 0) Transform.dequantChromaDc(dcScan, qpc)
          else new Array[Int](4)
        var b = 0
        while (b < 4) {
          val raster =
            if (ch.cbpChroma == 2) unzigzagAc(ac(b)) else new Array[Int](16)
          val scaled = Transform.dequant4x4(raster, qpc, skipDc = true)
          scaled(0) = dcScaled(b)
          val res = Transform.inverse4x4(scaled)
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val p = (cy0 + (b >> 1) * 4 + yy) * cs + cx0 + (b & 1) * 4 + xx
              plane(p) = Transform.clip255(plane(p) + res(yy * 4 + xx))
              xx += 1
            }
            yy += 1
          }
          b += 1
        }
      }
      one(cbP, ch.dcCbScan, ch.acCb, qpC)
      one(crP, ch.dcCrScan, ch.acCr, qpCr2)
    }

    private def unzigzag16(scan: Array[Int]): Array[Int] = {
      val out = new Array[Int](16)
      var i = 0
      while (i < 16) { out(Transform.Zigzag(i)) = scan(i); i += 1 }
      out
    }

    private def unzigzagAc(scan: Array[Int]): Array[Int] = {
      val out = new Array[Int](16)
      var i = 1
      while (i < 16) { out(Transform.Zigzag(i)) = scan(i - 1); i += 1 }
      out
    }
  }
}
