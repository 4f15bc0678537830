package graft.multimodal.h264

/** Pure-JVM H.264 decoder for the progressive CAVLC subset (ITU-T
  * H.264, public spec; no code derives from any existing decoder):
  *
  *  - profile_idc 66/77 (Baseline/Main) and the High family when its
  *    SPS/PPS extensions stay inside the subset (4:2:0, 8-bit, no
  *    scaling lists, no 8x8 transform — what x264 --no-cabac
  *    --no-8x8dct signals); second_chroma_qp_index_offset fully
  *    supported (per-plane Cr QP through residuals and deblocking);
  *    CAVLC entropy coding only (`entropy_coding_mode_flag`=0);
  *    4:2:0, 8-bit, frame_mbs_only
  *  - I/IDR slices: I_4x4, I_16x16 (all 24 variants), I_PCM
  *  - P slices: P_Skip (with §8.4.1.1 MV inference), every partition
  *    family — P_L0_16x16, 16x8 / 8x16 (directional MV prediction), and
  *    P_8x8 with all four sub_mb_types (8x8/8x4/4x8/4x4) — intra MBs
  *    inside P slices, multiple reference frames (te(v) ref_idx,
  *    PPS-default or slice-override active counts, sliding-window DPB,
  *    §8.2.4 reference list construction incl. short-term reordering
  *    commands), quarter-pel luma / eighth-pel chroma motion
  *    compensation
  *  - B slices (BOTH direct modes: spatial — the x264/ffmpeg default —
  *    and temporal with §8.4.1.2.3 POC-scaled co-located motion): every
  *    Table 7-14 mb_type — B_Skip/B_Direct_16x16, one- and two-partition
  *    L0/L1/Bi in 16x16/16x8/8x16, and B_8x8 with all Table 7-17
  *    sub_mb_types incl. B_Direct_8x8 — two reference lists initialized
  *    by POC (§8.2.4.2.3, with the L0==L1 head swap) and modified per
  *    list, §8.4.2.1 bi-prediction averaging, per-4×4 colZeroFlag with
  *    direct_8x8_inference, non-reference pictures (nal_ref_idc 0) kept
  *    out of the DPB, POC types 0 (§8.2.1.1 lsb wrap) and 1 (§8.2.1.2
  *    ref-frame cycle) with wrap-aware FrameNumOffset
  *  - LONG-TERM references + COMPLETE adaptive marking: every MMCO
  *    (§8.2.5.4 — unmark short/long, short→long conversion with idx
  *    replacement, MaxLongTermFrameIdx trimming, the op-5 soft-IDR
  *    reset of all references + frame_num/POC, current→long), IDR
  *    long_term_reference_flag, long-term tails in P/B list
  *    initialization, idc-2 list modification, sliding window exempting
  *    long-terms
  *  - WEIGHTED prediction (§8.4.2.3): explicit per-reference
  *    weight/offset tables for P (weighted_pred_flag) and B
  *    (weighted_bipred_idc 1), and implicit-by-POC bi-prediction
  *    weights (idc 2 — the x264 default for B frames)
  *  - MULTIPLE SLICES per picture (the framing real hardware encoders
  *    emit — often one slice per MB row): §6.4.8 neighbor availability
  *    is slice-masked for intra prediction, CAVLC contexts and MV
  *    prediction; each slice carries its own QP, reference lists and
  *    deblocking parameters; §8.7 slice-boundary filter control
  *    (disable_deblocking_filter_idc = 2) honored; ARBITRARY slice
  *    order accepted (slices are mutually independent under the
  *    availability mask, so they decode sorted by first_mb). Slices
  *    must cover the picture exactly once (no FMO slice groups).
  *  - frame cropping honored; deblocking per §8.7 with full inter
  *    boundary-strength derivation across both lists (reference
  *    comparison by picture identity, so per-slice list reorderings
  *    and same-picture bi-prediction derive exactly)
  *
  * Everything outside the subset FAILS FAST with a named error (CABAC,
  * the 8x8 transform, custom scaling lists, >8-bit / non-4:2:0, SP/SI,
  * FMO slice groups, interlace) rather than misreading — the stance of the HDF5/szip
  * readers (`graft.sources.Hdf5`). CABAC stays out deliberately: its
  * ~1000 context-initialization constants are empirical spec tables
  * that cannot be re-derived, and an unverifiable transcription would
  * risk silently wrong samples — the one failure mode this codebase
  * refuses. The reference writes MP4 video via imageio
  * (/root/reference/picoprobe/tools/temporal.py:26-35), whose
  * real-world codec is H.264; this decoder is what lets the engine
  * ingest such clips.
  */
object H264Decoder {

  final case class Sps(
      profileIdc: Int, levelIdc: Int, spsId: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      maxNumRefFrames: Int,
      widthMbs: Int, heightMbs: Int,
      cropLeft: Int, cropRight: Int, cropTop: Int, cropBottom: Int,
      direct8x8Inference: Boolean = true,
      // pic_order_cnt_type 1 (§8.2.1.2 cycle arithmetic)
      deltaAlwaysZero: Boolean = true, offsetNonRef: Int = 0,
      offsetTopBottom: Int = 0,
      cycleOffsets: IndexedSeq[Int] = IndexedSeq.empty) {
    // 4:2:0 frame_mbs_only crop units: 2 horizontally, 2 vertically (§7.4.2.1.1)
    def width: Int = widthMbs * 16 - 2 * (cropLeft + cropRight)
    def height: Int = heightMbs * 16 - 2 * (cropTop + cropBottom)
  }

  final case class Pps(
      ppsId: Int, spsId: Int, picInitQp: Int, chromaQpOffset: Int,
      deblockCtrl: Boolean, numRefDefault: Int, constrainedIntra: Boolean,
      weightedPred: Boolean = false, weightedBipredIdc: Int = 0,
      crQpOffset: Int = 0) // Cr offset: = chromaQpOffset unless the PPS extension overrides

  /** One reference's explicit prediction weights (§7.4.3.2): per-plane
    * multiplicative weight + additive offset under the slice's shared
    * log2 denominators.
    */
  final case class RefWeight(
      wY: Int, oY: Int, wCb: Int, oCb: Int, wCr: Int, oCr: Int)

  /** Per-slice weighted-prediction state: None = unweighted (the
    * default §8.4.2.1 averaging); Some = §8.4.2.3 weighted samples.
    */
  final case class WeightTable(
      logWDy: Int, logWDc: Int,
      l0: IndexedSeq[RefWeight], l1: IndexedSeq[RefWeight])

  /** A decoded frame: cropped planes, samples 0..255. */
  final case class Frame(
      width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def chromaWidth: Int = width / 2
    def chromaHeight: Int = height / 2
  }

  /** A reference picture: PADDED (MB-aligned), post-deblock planes. */
  final case class RefFrame(y: Array[Int], cb: Array[Int], cr: Array[Int])

  /** Per-4×4-block motion of a decoded reference picture, kept for
    * B-slice direct-mode derivation (the co-located picture's refIdx/MV
    * feed colZeroFlag, §8.4.1.2.2).
    */
  final case class PicMotion(
      ref0: Array[Int], ref1: Array[Int],
      mv0x: Array[Int], mv0y: Array[Int],
      mv1x: Array[Int], mv1y: Array[Int],
      pic0: Array[Int], pic1: Array[Int]) // referenced PICTURE ids (−1 = none)

  /** A DPB entry: planes + frame_num (PicNum arithmetic) + a
    * session-global picture id (deblock reference-identity compares) +
    * POC (B-slice list ordering) + motion field (direct modes) +
    * long-term marking (`ltIdx` = LongTermFrameIdx when `longTerm`).
    */
  final case class DpbPic(ref: RefFrame, frameNum: Int, picId: Int,
      poc: Int, motion: PicMotion,
      longTerm: Boolean = false, ltIdx: Int = -1)

  /** dec_ref_pic_marking content (§7.4.3.3): either sliding window
    * (`adaptive` = false) or an ordered MMCO list. Op 5 (reset all +
    * zero frame_num/POC) fails fast at parse.
    */
  sealed trait Mmco
  final case class UnmarkShort(diffMinus1: Int) extends Mmco // op 1
  final case class UnmarkLong(ltPicNum: Int) extends Mmco // op 2
  final case class ShortToLong(diffMinus1: Int, ltIdx: Int) extends Mmco // op 3
  final case class SetMaxLt(maxPlus1: Int) extends Mmco // op 4
  case object ResetAll extends Mmco // op 5: unmark everything, zero frame_num/POC
  final case class CurrToLong(ltIdx: Int) extends Mmco // op 6
  final case class Marking(adaptive: Boolean, ops: Seq[Mmco] = Nil,
      idrLongTerm: Boolean = false)

  /** §8.2.5 reference-picture marking, shared verbatim by decoder and
    * encoder (the two DPB models must evolve identically or ref_idx
    * meaning diverges): applies the MMCO list (or the §8.2.5.3 sliding
    * window) to `dpb`, then stores the current picture. Returns the new
    * MaxLongTermFrameIdx.
    */
  def applyMarking(dpb: scala.collection.mutable.ArrayBuffer[DpbPic],
      mk: Marking, curr: DpbPic, currFrameNum: Int, maxFrameNum: Int,
      maxNumRef: Int, maxLtIdxIn: Int): Int = {
    def picNum(fn: Int): Int = if (fn > currFrameNum) fn - maxFrameNum else fn
    var maxLtIdx = maxLtIdxIn
    var currLt = -1
    var reset = false
    if (mk.adaptive) {
      mk.ops.foreach {
        case ResetAll => // §8.2.5.4.5: everything unmarked, indices reset
          dpb.clear()
          maxLtIdx = -1
          reset = true
        case UnmarkShort(dm1) =>
          val target = currFrameNum - (dm1 + 1)
          val at = dpb.indexWhere(p => !p.longTerm && picNum(p.frameNum) == target)
          require(at >= 0, s"MMCO 1: short-term PicNum $target not in the DPB")
          dpb.remove(at)
        case UnmarkLong(n) =>
          val at = dpb.indexWhere(p => p.longTerm && p.ltIdx == n)
          require(at >= 0, s"MMCO 2: LongTermPicNum $n not in the DPB")
          dpb.remove(at)
        case ShortToLong(dm1, idx) =>
          require(idx <= maxLtIdx, s"MMCO 3: LongTermFrameIdx $idx > max $maxLtIdx")
          val dup = dpb.indexWhere(p => p.longTerm && p.ltIdx == idx)
          if (dup >= 0) dpb.remove(dup)
          val target = currFrameNum - (dm1 + 1)
          val at = dpb.indexWhere(p => !p.longTerm && picNum(p.frameNum) == target)
          require(at >= 0, s"MMCO 3: short-term PicNum $target not in the DPB")
          dpb(at) = dpb(at).copy(longTerm = true, ltIdx = idx)
        case SetMaxLt(maxPlus1) =>
          maxLtIdx = maxPlus1 - 1
          dpb.filterInPlace(p => !p.longTerm || p.ltIdx <= maxLtIdx)
        case CurrToLong(idx) =>
          require(idx <= maxLtIdx, s"MMCO 6: LongTermFrameIdx $idx > max $maxLtIdx")
          val dup = dpb.indexWhere(p => p.longTerm && p.ltIdx == idx)
          if (dup >= 0) dpb.remove(dup)
          currLt = idx
      }
    } else if (dpb.size >= math.max(maxNumRef, 1)) {
      // sliding window: unmark the oldest SHORT-TERM picture (smallest
      // FrameNumWrap); long-term pictures are exempt
      val shorts = dpb.zipWithIndex.filter(!_._1.longTerm)
      require(shorts.nonEmpty,
        "sliding window with a DPB full of long-term pictures")
      val oldest = shorts.minBy { case (p, _) => picNum(p.frameNum) }._2
      dpb.remove(oldest)
    }
    // after op 5 the current picture is considered to have frame_num 0
    // and a zeroed picture order count (§8.2.1, §8.2.5.4.5)
    val stored = if (reset) curr.copy(frameNum = 0, poc = 0) else curr
    dpb.insert(0,
      if (currLt >= 0) stored.copy(longTerm = true, ltIdx = currLt) else stored)
    require(dpb.size <= math.max(maxNumRef, 1),
      s"DPB holds ${dpb.size} pictures, max_num_ref_frames $maxNumRef")
    maxLtIdx
  }

  // mapped-Exp-Golomb coded_block_pattern, 4:2:0 (Table 9-4)
  private[h264] val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private[h264] val CbpIntraInv: Array[Int] = invert(CbpIntra)
  private[h264] val CbpInter: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  private[h264] val CbpInterInv: Array[Int] = invert(CbpInter)
  private def invert(t: Array[Int]): Array[Int] = {
    val inv = new Array[Int](48)
    t.zipWithIndex.foreach { case (cbp, code) => inv(cbp) = code }
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
    val highFamily = Set(100, 110, 122, 244, 44, 83, 86, 118, 128)
    require(profile == 66 || profile == 77 || highFamily.contains(profile),
      s"profile_idc $profile not supported")
    if (highFamily.contains(profile)) {
      // High-family SPS extension (§7.3.2.1.1): accepted when the coded
      // stream stays inside the subset — x264's CAVLC output signals
      // High even with 8x8dct disabled
      val chromaFmt = br.ue()
      require(chromaFmt == 1, s"chroma_format_idc $chromaFmt (4:2:0 only)")
      val bdLuma = br.ue()
      require(bdLuma == 0, s"bit_depth_luma ${bdLuma + 8} (8-bit only)")
      val bdChroma = br.ue()
      require(bdChroma == 0, s"bit_depth_chroma ${bdChroma + 8} (8-bit only)")
      require(br.u1() == 0,
        "qpprime_y_zero_transform_bypass (lossless bypass) not supported")
      require(br.u1() == 0, "seq_scaling_matrix (custom scaling lists) not supported")
    }
    val log2MaxFrameNum = br.ue() + 4
    val pocType = br.ue()
    require(pocType <= 2, s"pic_order_cnt_type $pocType")
    var log2MaxPocLsb = 0
    var deltaAlwaysZero = true
    var offsetNonRef = 0
    var offsetTopBottom = 0
    var cycleOffsets: IndexedSeq[Int] = IndexedSeq.empty
    if (pocType == 0) log2MaxPocLsb = br.ue() + 4
    else if (pocType == 1) {
      deltaAlwaysZero = br.u1() == 1
      offsetNonRef = br.se()
      offsetTopBottom = br.se()
      val cycleLen = br.ue()
      require(cycleLen <= 255, s"pic_order_cnt_cycle length $cycleLen")
      cycleOffsets = (0 until cycleLen).map(_ => br.se())
    }
    val maxRef = br.ue()
    br.u1() // gaps_in_frame_num_value_allowed_flag
    val widthMbs = br.ue() + 1
    val heightMapUnits = br.ue() + 1
    val frameMbsOnly = br.u1()
    require(frameMbsOnly == 1, "interlaced (frame_mbs_only_flag=0) not supported")
    val direct8x8 = br.u1() == 1 // direct_8x8_inference_flag
    var (cl, crr, ct, cb) = (0, 0, 0, 0)
    if (br.u1() == 1) { cl = br.ue(); crr = br.ue(); ct = br.ue(); cb = br.ue() }
    // vui_parameters_present_flag and beyond are irrelevant to decoding
    Sps(profile, level, spsId, log2MaxFrameNum, pocType, log2MaxPocLsb,
      math.max(1, maxRef), widthMbs, heightMapUnits, cl, crr, ct, cb, direct8x8,
      deltaAlwaysZero, offsetNonRef, offsetTopBottom, cycleOffsets)
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
    val numRefDefault = br.ue() + 1 // num_ref_idx_l0_default_active_minus1
    br.ue() // num_ref_idx_l1_default_active_minus1
    val weightedPred = br.u1() == 1 // explicit P weighting (§8.4.2.3)
    val bipredIdc = br.u(2) // 0 = average, 1 = explicit, 2 = implicit-by-POC
    require(bipredIdc <= 2, s"weighted_bipred_idc $bipredIdc")
    val picInitQp = br.se() + 26
    br.se() // pic_init_qs
    val chromaQpOffset = br.se()
    val deblockCtrl = br.u1() == 1
    val constrainedIntra = br.u1() == 1
    br.u1() // redundant_pic_cnt_present_flag
    // optional High-profile PPS extension (present iff more data precedes
    // the stop bit): 8x8 transform and scaling lists stay out of the
    // subset; the per-plane Cr offset is fully supported
    var crQpOffset = chromaQpOffset
    if (br.moreRbspData()) {
      require(br.u1() == 0, "transform_8x8_mode not supported (4x4 subset)")
      require(br.u1() == 0, "pic_scaling_matrix (custom scaling lists) not supported")
      crQpOffset = br.se() // second_chroma_qp_index_offset (Cr)
      require(crQpOffset >= -12 && crQpOffset <= 12,
        s"second_chroma_qp_index_offset $crQpOffset")
    }
    Pps(ppsId, spsId, picInitQp, chromaQpOffset, deblockCtrl, numRefDefault,
      constrainedIntra, weightedPred, bipredIdc, crQpOffset)
  }

  /** One slice NAL of a picture: unescaped RBSP + NAL header facts. */
  final case class SliceNal(rbsp: Array[Byte], idr: Boolean, refIdc: Int)

  /** Stateful decode session: holds the sliding-window DPB (reference
    * pictures + frame_num/POC/motion) so IPPP and IBP streams decode;
    * an IDR resets it. Frames return in DECODE order (the container's
    * composition times order display — `Codec.Mp4Video` applies ctts).
    * One session per video track.
    */
  final class Session(sps: Sps, pps: Pps) {
    private val dpb = scala.collection.mutable.ArrayBuffer.empty[DpbPic]
    private var nextPicId = 0
    // §8.2.1.1 state: lsb/msb of the previous REFERENCE picture
    private var prevPocLsb = 0
    private var prevPocMsb = 0
    // §8.2.5 state: MaxLongTermFrameIdx (−1 = no long-term allowed)
    private var maxLtIdx = -1
    // §8.2.1.2/.3 state: FrameNumOffset tracking (POC types 1 and 2)
    private var prevFrameNumOffset = 0
    private var prevFrameNum = 0

    def reset(): Unit = {
      dpb.clear(); prevPocLsb = 0; prevPocMsb = 0; maxLtIdx = -1
      prevFrameNumOffset = 0; prevFrameNum = 0
    }

    /** Decode one AVCC sample (length-prefixed NALs) to its frame. The
      * sample is one access unit; every coded-slice NAL inside it is a
      * slice of the SAME picture (multi-slice encoders emit several).
      */
    def decodeSample(sample: Array[Byte], lengthSize: Int): Frame = {
      val slices = Seq.newBuilder[SliceNal]
      var pos = 0
      while (pos + lengthSize <= sample.length) {
        var len = 0
        var i = 0
        while (i < lengthSize) { len = (len << 8) | (sample(pos + i) & 0xFF); i += 1 }
        pos += lengthSize
        require(len > 0 && pos + len <= sample.length, "bad NAL length in sample")
        val nalType = sample(pos) & 0x1F
        if (nalType == 1 || nalType == 5)
          slices += SliceNal(Nal.unescape(sample, pos + 1, pos + len),
            nalType == 5, (sample(pos) >> 5) & 3)
        // SPS/PPS/SEI/AUD NALs inside samples are skipped (avcC carries params)
        pos += len
      }
      val ss = slices.result()
      require(ss.nonEmpty, "sample contains no coded slice")
      decodePictureNals(ss)
    }

    /** §8.2.1 picture order count for the current picture. */
    private def computePoc(firstSlice: SliceNal): Int = {
      val br = new BitReader(firstSlice.rbsp)
      br.ue() // first_mb_in_slice
      br.ue() // slice_type
      br.ue() // pps_id
      val frameNum = br.u(sps.log2MaxFrameNum)
      if (firstSlice.idr) br.ue() // idr_pic_id
      // FrameNumOffset (§8.2.1.2/.3): steps by MaxFrameNum at each wrap
      def frameNumOffset: Int = {
        val maxFn = 1 << sps.log2MaxFrameNum
        if (firstSlice.idr) 0
        else if (frameNum < prevFrameNum) prevFrameNumOffset + maxFn
        else prevFrameNumOffset
      }
      sps.pocType match {
        case 0 =>
          val lsb = br.u(sps.log2MaxPocLsb)
          val maxLsb = 1 << sps.log2MaxPocLsb
          val (pLsb, pMsb) = if (firstSlice.idr) (0, 0) else (prevPocLsb, prevPocMsb)
          val msb =
            if (lsb < pLsb && pLsb - lsb >= maxLsb / 2) pMsb + maxLsb
            else if (lsb > pLsb && lsb - pLsb > maxLsb / 2) pMsb - maxLsb
            else pMsb
          if (firstSlice.refIdc > 0) { prevPocLsb = lsb; prevPocMsb = msb }
          msb + lsb
        case 1 => // §8.2.1.2: expected POC from the SPS ref-frame cycle
          val delta0 =
            if (sps.deltaAlwaysZero) 0 else br.se() // delta_pic_order_cnt[0]
          val fno = frameNumOffset
          val cycle = sps.cycleOffsets
          var absFrameNum = if (cycle.nonEmpty) fno + frameNum else 0
          if (firstSlice.refIdc == 0 && absFrameNum > 0) absFrameNum -= 1
          var expected = 0
          if (absFrameNum > 0) {
            val cycleCnt = (absFrameNum - 1) / cycle.length
            val inCycle = (absFrameNum - 1) % cycle.length
            expected = cycleCnt * cycle.sum + cycle.take(inCycle + 1).sum
          }
          if (firstSlice.refIdc == 0) expected += sps.offsetNonRef
          val top = expected + delta0
          val bottom = top + sps.offsetTopBottom // frame: min of the fields
          prevFrameNumOffset = fno
          prevFrameNum = frameNum
          math.min(top, bottom)
        case _ => // type 2: POC follows decode order (wrap-aware)
          val fno = frameNumOffset
          prevFrameNumOffset = fno
          prevFrameNum = frameNum
          2 * (fno + frameNum) - (if (firstSlice.refIdc > 0) 0 else 1)
      }
    }

    /** Decode one picture from its slice NALs (already unescaped). */
    def decodePictureNals(slices: Seq[SliceNal]): Frame = {
      val idr = slices.head.idr
      require(slices.forall(_.idr == idr), "mixed IDR/non-IDR slices in one picture")
      if (idr) dpb.clear()
      val isRef = slices.head.refIdc > 0
      val poc = computePoc(slices.head)
      val picId = nextPicId
      nextPicId += 1
      val (frame, ref, frameNum, motion, marking) =
        decodePicture(slices, sps, pps, dpb.toIndexedSeq, poc)
      if (isRef) {
        val curr = DpbPic(ref, frameNum, picId, poc, motion)
        if (idr) { // §8.2.5.1: IDR marking
          maxLtIdx = if (marking.idrLongTerm) 0 else -1
          dpb.insert(0,
            if (marking.idrLongTerm) curr.copy(longTerm = true, ltIdx = 0) else curr)
        } else {
          maxLtIdx = applyMarking(dpb, marking, curr, frameNum,
            1 << sps.log2MaxFrameNum, sps.maxNumRefFrames, maxLtIdx)
          if (marking.ops.contains(ResetAll)) {
            prevPocLsb = 0; prevPocMsb = 0
            prevFrameNumOffset = 0; prevFrameNum = 0
          }
        }
      }
      frame
    }

    /** Single-NAL convenience (one slice per picture, reference). */
    def decodeSliceNal(rbsp: Array[Byte], idr: Boolean): Frame =
      decodePictureNals(Seq(SliceNal(rbsp, idr, 3)))
  }

  /** One-shot convenience for IDR samples (intra fixtures, first frame). */
  def decodeAvccSample(sample: Array[Byte], lengthSize: Int,
      sps: Sps, pps: Pps): Frame =
    new Session(sps, pps).decodeSample(sample, lengthSize)

  /** Decode an Annex-B stream (start-code framed). Returns all frames;
    * in-band SPS/PPS are honored; IPPP structure decodes via the session
    * DPB. Slice NALs group into pictures at each first_mb_in_slice == 0
    * boundary (§7.4.1.2.4 simplified for this subset: slices arrive in
    * raster order, so a picture starts exactly at first_mb 0).
    */
  def decodeAnnexB(data: Array[Byte]): Seq[Frame] = {
    val nals = splitAnnexB(data)
    var session: Session = null
    var sps: Sps = null
    var pps: Pps = null
    val frames = Seq.newBuilder[Frame]
    val pending = scala.collection.mutable.ArrayBuffer.empty[SliceNal]
    def flush(): Unit = if (pending.nonEmpty) {
      frames += session.decodePictureNals(pending.toSeq)
      pending.clear()
    }
    nals.foreach { case (from, to) =>
      val nalType = data(from) & 0x1F
      val rbsp = Nal.unescape(data, from + 1, to)
      nalType match {
        case 7 => flush(); sps = parseSps(rbsp); session = null
        case 8 => flush(); pps = parsePps(rbsp); session = null
        case 1 | 5 =>
          require(sps != null && pps != null, "slice before SPS/PPS")
          if (session == null) session = new Session(sps, pps)
          // §7.4.1.2.4 (subset): a new picture starts when frame_num or
          // IDR-ness changes, or a first_mb repeats (ASO within one
          // picture keeps both constant and covers each MB once)
          val br0 = new BitReader(rbsp)
          val firstMb = br0.ue()
          br0.ue(); br0.ue() // slice_type, pps_id
          val fn = br0.u(sps.log2MaxFrameNum)
          val idr = nalType == 5
          val boundary = pending.nonEmpty && {
            val br1 = new BitReader(pending.head.rbsp)
            val headFirst = br1.ue()
            br1.ue(); br1.ue()
            val headFn = br1.u(sps.log2MaxFrameNum)
            fn != headFn || idr != pending.head.idr ||
              pending.exists(p => new BitReader(p.rbsp).ue() == firstMb) ||
              headFirst == firstMb
          }
          if (boundary) flush()
          pending += SliceNal(rbsp, idr, (data(from) >> 5) & 3)
        case _ => // SEI / AUD / filler — skip
      }
    }
    flush()
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
    var e = nextStart - 3
    if (e > 0 && d(e - 1) == 0) e -= 1
    e
  }

  // ------------------------------------------------------------ slice

  /** Parsed slice header: everything MB decoding needs per slice.
    * `refs0`/`refs1` are the constructed reference lists (L1 empty
    * outside B slices).
    */
  private final case class SliceHeader(
      firstMb: Int, isP: Boolean, isB: Boolean, frameNum: Int, poc: Int,
      refs0: IndexedSeq[DpbPic], refs1: IndexedSeq[DpbPic],
      numRefActive0: Int, numRefActive1: Int, sliceQp: Int,
      disableDeblock: Int, alphaOff: Int, betaOff: Int,
      explicitWeights: Option[WeightTable], implicitWeights: Boolean,
      marking: Marking, directSpatial: Boolean)

  private def parseSliceHeader(br: BitReader, nal: SliceNal,
      sps: Sps, pps: Pps, dpb: IndexedSeq[DpbPic], poc: Int): SliceHeader = {
    val idr = nal.idr
    val firstMb = br.ue()
    val sliceType = br.ue()
    val isP = sliceType == 0 || sliceType == 5
    val isB = sliceType == 1 || sliceType == 6
    val isI = sliceType == 2 || sliceType == 7
    require(isP || isI || isB, s"slice_type $sliceType not supported (SP/SI)")
    require(!(isP || isB) || dpb.nonEmpty,
      s"${if (isB) "B" else "P"} slice with an empty reference list")
    require(!isB || sps.pocType != 2,
      "B slices require pic_order_cnt_type 0 or 1 (type 2 forbids reordering)")
    // constrained intra masks inter neighbors out of intra-in-P/B
    // prediction — decoding it without the masking would silently drift
    require(isI || !pps.constrainedIntra,
      "constrained_intra_pred_flag not supported for P/B slices")
    val ppsId = br.ue()
    require(ppsId == pps.ppsId, s"slice references pps $ppsId")
    val frameNum = br.u(sps.log2MaxFrameNum)
    if (idr) br.ue() // idr_pic_id
    if (sps.pocType == 0) br.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb (Session read it)
    else if (sps.pocType == 1 && !sps.deltaAlwaysZero) br.se() // delta_pic_order_cnt[0]
    val directSpatial = if (isB) br.u1() == 1 else true
    // the PARSED active counts drive te(v) ref_idx parsing; actual DPB
    // bounds are enforced where each ref_idx is used
    var numRefActive0 = pps.numRefDefault
    var numRefActive1 = 1
    var refs0: IndexedSeq[DpbPic] = IndexedSeq.empty
    var refs1: IndexedSeq[DpbPic] = IndexedSeq.empty
    if (isP || isB) {
      if (br.u1() == 1) { // num_ref_idx_active_override_flag
        numRefActive0 = br.ue() + 1
        if (isB) numRefActive1 = br.ue() + 1
      }
      val maxFn = 1 << sps.log2MaxFrameNum
      if (isP) {
        refs0 = applyModification(br, initListP(dpb, frameNum, maxFn),
          dpb, frameNum, numRefActive0, maxFn)
      } else {
        val (i0, i1) = initListsB(dpb, poc)
        refs0 = applyModification(br, i0, dpb, frameNum, numRefActive0, maxFn)
        refs1 = applyModification(br, i1, dpb, frameNum, numRefActive1, maxFn)
      }
    }
    // §7.3.3.2 pred_weight_table: explicit weights for P (PPS
    // weighted_pred_flag) and for B (weighted_bipred_idc 1)
    val explicitWeights: Option[WeightTable] =
      if ((isP && pps.weightedPred) || (isB && pps.weightedBipredIdc == 1)) {
        val logWDy = br.ue()
        require(logWDy <= 7, s"luma_log2_weight_denom $logWDy")
        val logWDc = br.ue()
        require(logWDc <= 7, s"chroma_log2_weight_denom $logWDc")
        def refWeights(count: Int): IndexedSeq[RefWeight] =
          (0 until count).map { _ =>
            var (wY, oY) = (1 << logWDy, 0)
            if (br.u1() == 1) { wY = br.se(); oY = br.se() }
            var (wCb, oCb, wCr, oCr) = (1 << logWDc, 0, 1 << logWDc, 0)
            if (br.u1() == 1) {
              wCb = br.se(); oCb = br.se(); wCr = br.se(); oCr = br.se()
            }
            RefWeight(wY, oY, wCb, oCb, wCr, oCr)
          }
        val l0 = refWeights(numRefActive0)
        val l1 = if (isB) refWeights(numRefActive1) else IndexedSeq.empty
        Some(WeightTable(logWDy, logWDc, l0, l1))
      } else None
    val implicitWeights = isB && pps.weightedBipredIdc == 2
    // §7.3.3.3 dec_ref_pic_marking (reference pictures only)
    val marking: Marking =
      if (nal.refIdc == 0) Marking(adaptive = false)
      else if (idr) {
        br.u1() // no_output_of_prior_pics_flag
        Marking(adaptive = false, idrLongTerm = br.u1() == 1)
      } else if (br.u1() == 0) Marking(adaptive = false)
      else {
        val ops = Seq.newBuilder[Mmco]
        var op = br.ue()
        while (op != 0) {
          op match {
            case 1 => ops += UnmarkShort(br.ue())
            case 2 => ops += UnmarkLong(br.ue())
            case 3 => ops += ShortToLong(br.ue(), br.ue())
            case 4 => ops += SetMaxLt(br.ue())
            case 5 => ops += ResetAll
            case 6 => ops += CurrToLong(br.ue())
            case o => throw new IllegalArgumentException(
              s"memory_management_control_operation $o")
          }
          op = br.ue()
        }
        Marking(adaptive = true, ops.result())
      }
    val sliceQp = pps.picInitQp + br.se()
    require(sliceQp >= 0 && sliceQp <= 51, s"slice QP $sliceQp")
    var disableDeblock = 0
    var alphaOff = 0
    var betaOff = 0
    if (pps.deblockCtrl) {
      disableDeblock = br.ue()
      require(disableDeblock <= 2, s"disable_deblocking_filter_idc $disableDeblock")
      if (disableDeblock != 1) { alphaOff = 2 * br.se(); betaOff = 2 * br.se() }
    }
    SliceHeader(firstMb, isP, isB, frameNum, poc, refs0, refs1,
      numRefActive0, numRefActive1, sliceQp, disableDeblock, alphaOff, betaOff,
      explicitWeights, implicitWeights, marking, directSpatial)
  }

  private def decodePicture(slices: Seq[SliceNal],
      sps: Sps, pps: Pps, dpb: IndexedSeq[DpbPic], poc: Int)
      : (Frame, RefFrame, Int, PicMotion, Marking) = {
    val n = sps.widthMbs * sps.heightMbs
    var dec: FrameDecoder = null
    var frameNum = -1
    var nextMb = 0
    var marking = Marking(adaptive = false)
    // arbitrary slice order (ASO): slices are mutually independent
    // (neighbor availability is slice-masked), so decode them sorted by
    // first_mb regardless of arrival order
    val ordered = slices.sortBy(nal => new BitReader(nal.rbsp).ue())
    ordered.zipWithIndex.foreach { case (nal, sliceIdx) =>
      val br = new BitReader(nal.rbsp)
      val hdr = parseSliceHeader(br, nal, sps, pps, dpb, poc)
      if (sliceIdx == 0) {
        require(hdr.firstMb == 0, "picture does not start at macroblock 0")
        frameNum = hdr.frameNum
        marking = hdr.marking
        dec = new FrameDecoder(sps, pps)
      } else {
        require(hdr.frameNum == frameNum,
          s"slice frame_num ${hdr.frameNum} != picture frame_num $frameNum")
        require(hdr.firstMb == nextMb,
          s"slices leave a gap at MB $nextMb (got ${hdr.firstMb})")
      }
      nextMb = dec.decodeSliceMbs(br, hdr, sliceIdx)
    }
    require(nextMb == n, s"picture covered $nextMb of $n macroblocks")
    dec.deblockFrame()
    (dec.crop(), RefFrame(dec.y, dec.cb, dec.cr), frameNum, dec.motion(), marking)
  }

  /** §8.2.4.2.1 P initialization: short-term by descending PicNum (with
    * FrameNumWrap), then long-term by ascending LongTermPicNum.
    */
  private[h264] def initListP(dpb: IndexedSeq[DpbPic], currFrameNum: Int,
      maxFrameNum: Int): IndexedSeq[DpbPic] = {
    def picNum(fn: Int): Int = if (fn > currFrameNum) fn - maxFrameNum else fn
    dpb.filter(!_.longTerm).sortBy(p => -picNum(p.frameNum)) ++
      dpb.filter(_.longTerm).sortBy(_.ltIdx)
  }

  /** §8.2.4.2.3 B initialization: short-term by POC — L0 = past
    * (descending) then future (ascending), L1 mirrored — then long-term
    * by ascending LongTermPicNum on both lists; if L1 would mirror L0
    * exactly, its first two entries swap.
    */
  private def initListsB(dpb: IndexedSeq[DpbPic], currPoc: Int)
      : (IndexedSeq[DpbPic], IndexedSeq[DpbPic]) = {
    val shorts = dpb.filter(!_.longTerm)
    val longs = dpb.filter(_.longTerm).sortBy(_.ltIdx)
    val past = shorts.filter(_.poc < currPoc).sortBy(p => -p.poc)
    val future = shorts.filter(_.poc >= currPoc).sortBy(_.poc)
    val l0 = past ++ future ++ longs
    var l1 = future ++ past ++ longs
    if (l1.size > 1 && l1 == l0) l1 = IndexedSeq(l1(1), l1(0)) ++ l1.drop(2)
    (l0, l1)
  }

  /** §8.2.4.3 modification: idc 0/1 abs_diff_pic_num reordering applied
    * to an initial list; long-term (idc 2) fails fast. The list is built
    * at working length numRefActive+1 and truncated, per the standard's
    * insertion process.
    */
  private def applyModification(br: BitReader, initial: IndexedSeq[DpbPic],
      dpb: IndexedSeq[DpbPic], currFrameNum: Int, numRefActive: Int,
      maxFrameNum: Int): IndexedSeq[DpbPic] = {
    def picNum(fn: Int): Int = if (fn > currFrameNum) fn - maxFrameNum else fn
    var list = initial.toBuffer
    if (br.u1() == 1) { // ref_pic_list_modification_flag_lX
      var refIdx = 0
      var picNumPred = currFrameNum
      var idc = br.ue()
      while (idc != 3) {
        require(idc <= 2, s"modification_of_pic_nums_idc $idc")
        if (idc == 2) { // §8.2.4.3.2: long-term reposition
          val n = br.ue() // long_term_pic_num
          val pic = list.find(p => p.longTerm && p.ltIdx == n)
            .orElse(dpb.find(p => p.longTerm && p.ltIdx == n))
          require(pic.isDefined, s"reordered LongTermPicNum $n not in the DPB")
          list.insert(refIdx, pic.get)
          refIdx += 1
          val dupAt = list.indexWhere(p => p.longTerm && p.ltIdx == n, refIdx)
          if (dupAt >= 0) list.remove(dupAt)
        } else {
          val absDiff = br.ue() + 1
          var noWrap =
            if (idc == 0) picNumPred - absDiff else picNumPred + absDiff
          if (noWrap < 0) noWrap += maxFrameNum
          else if (noWrap >= maxFrameNum) noWrap -= maxFrameNum
          picNumPred = noWrap
          val target = if (noWrap > currFrameNum) noWrap - maxFrameNum else noWrap
          val pic = list.find(p => !p.longTerm && picNum(p.frameNum) == target)
            .orElse(dpb.find(p => !p.longTerm && picNum(p.frameNum) == target))
          require(pic.isDefined, s"reordered PicNum $target not in the DPB")
          // §8.2.4.3.1 insertion: shift, place at refIdx, drop the later dup
          list.insert(refIdx, pic.get)
          refIdx += 1
          val dupAt = list.indexWhere(
            p => !p.longTerm && picNum(p.frameNum) == target, refIdx)
          if (dupAt >= 0) list.remove(dupAt)
        }
        idc = br.ue()
      }
    }
    list.take(math.max(numRefActive, 1)).toIndexedSeq
  }

  /** Per-picture decoding state and the per-slice MB loop. */
  private final class FrameDecoder(sps: Sps, pps: Pps) {
    val wMb = sps.widthMbs
    val hMb = sps.heightMbs
    val ls = wMb * 16 // luma stride
    val cs = wMb * 8 // chroma stride
    val hPix = hMb * 16
    val hcPix = hMb * 8
    val y = new Array[Int](ls * hPix)
    val cb = new Array[Int](cs * hcPix)
    val cr = new Array[Int](cs * hcPix)
    // per-4x4-block CAVLC totalCoeff, luma (4wMb × 4hMb) and chroma (2wMb × 2hMb)
    private val tcY = new Array[Int](wMb * 4 * hMb * 4)
    private val tcCb = new Array[Int](wMb * 2 * hMb * 2)
    private val tcCr = new Array[Int](wMb * 2 * hMb * 2)
    // per-4x4-block intra prediction mode (−1 = not an I_4x4 block)
    private val i4Mode = Array.fill(wMb * 4 * hMb * 4)(-1)
    /** Final luma QP of each MB (deblocking needs it). */
    val mbQp = new Array[Int](wMb * hMb)
    /** Per-MB deblock parameters (each MB filters with ITS slice's). */
    private val mbDisable = Array.fill(wMb * hMb)(0)
    private val mbAlphaOff = new Array[Int](wMb * hMb)
    private val mbBetaOff = new Array[Int](wMb * hMb)
    /** Motion state (deblock bS + MV prediction + slice availability). */
    val bstate = new BlockState(wMb, hMb)

    // ---- per-slice state (reset by decodeSliceMbs)
    private var qp = 0
    private var refs0: IndexedSeq[DpbPic] = IndexedSeq.empty
    private var refs1: IndexedSeq[DpbPic] = IndexedSeq.empty
    private var numRefActive0 = 0
    private var numRefActive1 = 0
    private var explicitW: Option[WeightTable] = None
    private var implicitW = false
    private var slicePoc = 0
    private var directSpatial = true

    /** The finished picture's motion field (stored with reference
      * pictures for later direct-mode derivation).
      */
    def motion(): PicMotion = PicMotion(
      bstate.refIdx(0).clone(), bstate.refIdx(1).clone(),
      bstate.mvX(0).clone(), bstate.mvY(0).clone(),
      bstate.mvX(1).clone(), bstate.mvY(1).clone(),
      bstate.refPic(0).clone(), bstate.refPic(1).clone())

    /** Decode one slice's macroblocks; returns the next MB address. */
    def decodeSliceMbs(br: BitReader, hdr: SliceHeader, sliceIdx: Int): Int = {
      bstate.curSlice = sliceIdx
      qp = hdr.sliceQp
      refs0 = hdr.refs0
      refs1 = hdr.refs1
      numRefActive0 = hdr.numRefActive0
      numRefActive1 = hdr.numRefActive1
      explicitW = hdr.explicitWeights
      implicitW = hdr.implicitWeights
      slicePoc = hdr.poc
      directSpatial = hdr.directSpatial
      val n = wMb * hMb
      var mb = hdr.firstMb
      var moreData = true
      while (moreData) {
        if (hdr.isP || hdr.isB) {
          var run = br.ue()
          require(mb + run <= n, s"mb_skip_run $run overruns the picture")
          while (run > 0) {
            sliceParamsFor(mb, hdr)
            if (hdr.isB) decodeBSkip(mb % wMb, mb / wMb)
            else decodeSkip(mb % wMb, mb / wMb)
            mb += 1; run -= 1
          }
          moreData = br.moreRbspData()
        }
        if (moreData) {
          require(mb < n, "slice data overruns the picture")
          sliceParamsFor(mb, hdr)
          decodeMb(br, mb % wMb, mb / wMb, hdr.isP, hdr.isB)
          mb += 1
          moreData = br.moreRbspData()
        }
      }
      mb
    }

    private def sliceParamsFor(mb: Int, hdr: SliceHeader): Unit = {
      mbDisable(mb) = hdr.disableDeblock
      mbAlphaOff(mb) = hdr.alphaOff
      mbBetaOff(mb) = hdr.betaOff
    }

    /** §8.7 over the finished picture with per-MB slice parameters. */
    def deblockFrame(): Unit =
      Deblock.filterFramePerMb(y, cb, cr, wMb, hMb, mbQp,
        pps.chromaQpOffset, pps.crQpOffset,
        mbAlphaOff, mbBetaOff, mbDisable, bstate.mbSliceOf,
        bstate.boundaryStrength(tcY))

    // --------------------------------------------------------- neighbors

    /** Availability of the MB containing 4×4 LUMA block (gbx, gby). */
    private def lumaBlkAvail(gbx: Int, gby: Int): Boolean =
      gbx >= 0 && gby >= 0 && bstate.mbAvail(gbx / 4, gby / 4)

    private def chromaBlkAvail(gbx: Int, gby: Int): Boolean =
      gbx >= 0 && gby >= 0 && bstate.mbAvail(gbx / 2, gby / 2)

    private def lumaNC(gbx: Int, gby: Int): Int = {
      val availA = lumaBlkAvail(gbx - 1, gby)
      val availB = lumaBlkAvail(gbx, gby - 1)
      if (availA && availB) (tcY(gby * wMb * 4 + gbx - 1) +
        tcY((gby - 1) * wMb * 4 + gbx) + 1) >> 1
      else if (availA) tcY(gby * wMb * 4 + gbx - 1)
      else if (availB) tcY((gby - 1) * wMb * 4 + gbx)
      else 0
    }

    private def chromaNC(tc: Array[Int], gbx: Int, gby: Int): Int = {
      val availA = chromaBlkAvail(gbx - 1, gby)
      val availB = chromaBlkAvail(gbx, gby - 1)
      if (availA && availB) (tc(gby * wMb * 2 + gbx - 1) +
        tc((gby - 1) * wMb * 2 + gbx) + 1) >> 1
      else if (availA) tc(gby * wMb * 2 + gbx - 1)
      else if (availB) tc((gby - 1) * wMb * 2 + gbx)
      else 0
    }

    // ------------------------------------------------------------- MB

    private def decodeMb(br: BitReader, mbX: Int, mbY: Int,
        isP: Boolean, isB: Boolean): Unit = {
      bstate.beginMb(mbX, mbY)
      val mbType = br.ue()
      if (isP && mbType < 5) {
        decodeInterMb(br, mbType, mbX, mbY)
        mbQp(mbY * wMb + mbX) = qp
      } else if (isB && mbType < 23) {
        decodeBMb(br, mbType, mbX, mbY)
        mbQp(mbY * wMb + mbX) = qp
      } else {
        val t = if (isP) mbType - 5 else if (isB) mbType - 23 else mbType
        bstate.setIntraMb(mbX, mbY)
        if (t == 25) { decodePcm(br, mbX, mbY); mbQp(mbY * wMb + mbX) = 0 }
        else if (t == 0) { decodeI4x4(br, mbX, mbY); mbQp(mbY * wMb + mbX) = qp }
        else if (t >= 1 && t <= 24) {
          decodeI16x16(br, t - 1, mbX, mbY); mbQp(mbY * wMb + mbX) = qp
        } else throw new IllegalArgumentException(
          s"mb_type $mbType not supported in this slice type")
      }
    }

    // ------------------------------------------------------------ inter

    /** P partition geometry: (x, y, w, h in luma samples, MvPred shape). */
    private def partitions(mbType: Int): Seq[(Int, Int, Int, Int, Char)] =
      mbType match {
        case 0 => Seq((0, 0, 16, 16, ' '))
        case 1 => Seq((0, 0, 16, 8, 'T'), (0, 8, 16, 8, 'B'))
        case 2 => Seq((0, 0, 8, 16, 'L'), (8, 0, 8, 16, 'R'))
        case t => throw new IllegalArgumentException(s"P mb_type $t")
      }

    /** Sub-partition geometry within one 8×8 (§7.4.5.2 sub_mb_type). */
    private[h264] def subPartitions(subType: Int): Seq[(Int, Int, Int, Int)] =
      subType match {
        case 0 => Seq((0, 0, 8, 8))
        case 1 => Seq((0, 0, 8, 4), (0, 4, 8, 4))
        case 2 => Seq((0, 0, 4, 8), (4, 0, 4, 8))
        case 3 => Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4))
        case t => throw new IllegalArgumentException(s"sub_mb_type $t")
      }

    private def teRef(br: BitReader, active: Int): Int =
      if (active <= 1) 0
      else if (active == 2) 1 - br.u1() // te(v) with range 1: flipped bit
      else br.ue()

    private def decodeInterMb(br: BitReader, mbType: Int, mbX: Int, mbY: Int): Unit = {
      if (mbType == 3 || mbType == 4) { decodeP8x8(br, mbType, mbX, mbY); return }
      val parts = partitions(mbType)
      // ref_idx for every partition first (§7.3.5.1), then every mvd;
      // block state updates as each mvd lands — later partitions of this
      // MB predict from earlier ones
      val refIdxs = parts.map(_ => teRef(br, numRefActive0))
      val mvs = parts.zip(refIdxs).map { case ((px, py, pw, ph, shape), ref) =>
        require(ref < refs0.size, s"ref_idx $ref outside DPB")
        val bx = mbX * 4 + px / 4
        val by = mbY * 4 + py / 4
        val (predX, predY) = MvPred.predict(bstate.neigh, bx, by, pw / 4, ref, shape)
        val mvx = predX + br.se()
        val mvy = predY + br.se()
        bstate.setBlocks(bx, by, pw / 4, ph / 4, ref, refs0(ref).picId, mvx, mvy)
        (mvx, mvy)
      }

      // motion-compensated prediction into the planes
      parts.zip(refIdxs).zip(mvs).foreach { case (((px, py, pw, ph, _), ref), (mvx, mvy)) =>
        writeInterPred(mbX * 16 + px, mbY * 16 + py, pw, ph, ref, mvx, mvy)
      }

      // residual
      val cbpCode = br.ue()
      require(cbpCode < 48, s"coded_block_pattern code $cbpCode")
      val cbp = CbpInter(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) bumpQp(br.se())
      decodeLumaResidual4x4(br, mbX, mbY, cbpLuma)
      val chroma = parseChromaResidual(br, mbX, mbY, cbpChroma)
      addChromaResidual(mbX, mbY, chroma)
    }

    /** P_8x8 / P_8x8ref0 (§7.3.5.2 sub_mb_pred): four sub_mb_types, then
      * ref_idx per 8×8 (P_8x8 only), then mvd per sub-partition — all MV
      * predictions through the standard median path (no directional
      * cases below the MB-partition level).
      */
    private def decodeP8x8(br: BitReader, mbType: Int, mbX: Int, mbY: Int): Unit = {
      val subTypes = (0 until 4).map(_ => br.ue())
      subTypes.foreach(t => require(t <= 3, s"sub_mb_type $t"))
      val refIdxs =
        if (mbType == 4) Seq(0, 0, 0, 0) // P_8x8ref0
        else (0 until 4).map(_ => teRef(br, numRefActive0))
      refIdxs.foreach(r => require(r < refs0.size, s"ref_idx $r outside DPB"))
      for (e8 <- 0 until 4) {
        val ox = (e8 & 1) * 8
        val oy = (e8 >> 1) * 8
        subPartitions(subTypes(e8)).foreach { case (sx, sy, sw, sh) =>
          val px = ox + sx; val py = oy + sy
          val bx = mbX * 4 + px / 4
          val by = mbY * 4 + py / 4
          val (predX, predY) = MvPred.predict(bstate.neigh, bx, by, sw / 4, refIdxs(e8))
          val mvx = predX + br.se()
          val mvy = predY + br.se()
          bstate.setBlocks(bx, by, sw / 4, sh / 4, refIdxs(e8),
            refs0(refIdxs(e8)).picId, mvx, mvy)
          writeInterPred(mbX * 16 + px, mbY * 16 + py, sw, sh, refIdxs(e8), mvx, mvy)
        }
      }
      val cbpCode = br.ue()
      require(cbpCode < 48, s"coded_block_pattern code $cbpCode")
      val cbp = CbpInter(cbpCode)
      if (cbp != 0) bumpQp(br.se())
      decodeLumaResidual4x4(br, mbX, mbY, cbp & 15)
      val chroma = parseChromaResidual(br, mbX, mbY, cbp >> 4)
      addChromaResidual(mbX, mbY, chroma)
    }

    private def decodeSkip(mbX: Int, mbY: Int): Unit = {
      bstate.beginMb(mbX, mbY)
      val (mvx, mvy) = MvPred.skipMv(bstate.neigh, mbX * 4, mbY * 4)
      bstate.setBlocks(mbX * 4, mbY * 4, 4, 4, 0, refs0(0).picId, mvx, mvy)
      writeInterPred(mbX * 16, mbY * 16, 16, 16, 0, mvx, mvy)
      // no residual, no qp change; CAVLC contexts read 0 (arrays 0-init)
      mbQp(mbY * wMb + mbX) = qp
    }

    /** L0 motion compensation for one partition at luma (x0, y0). */
    private def writeInterPred(x0: Int, y0: Int, pw: Int, ph: Int,
        ref: Int, mvx: Int, mvy: Int): Unit =
      writeInterPredMulti(x0, y0, pw, ph, Seq((0, ref, mvx, mvy)))

    /** Motion compensation with one or two list predictions, combined
      * per the slice's weighting mode: §8.4.2.1 averaging (default),
      * §8.4.2.3 explicit weights, or implicit-by-POC bi weights. Each
      * pred is (list, refIdx, mvx, mvy).
      */
    private def writeInterPredMulti(x0: Int, y0: Int, pw: Int, ph: Int,
        preds: Seq[(Int, Int, Int, Int)]): Unit = {
      val cw = pw / 2; val chh = ph / 2
      val cx0 = x0 / 2; val cy0 = y0 / 2
      val parts = preds.map { case (list, ref, mvx, mvy) =>
        val rf = (if (list == 0) refs0 else refs1)(ref).ref
        (Interp.lumaBlock(rf.y, ls, hPix, 4 * x0 + mvx, 4 * y0 + mvy, pw, ph),
          Interp.chromaBlock(rf.cb, cs, hcPix, 4 * x0 + mvx, 4 * y0 + mvy, cw, chh),
          Interp.chromaBlock(rf.cr, cs, hcPix, 4 * x0 + mvx, 4 * y0 + mvy, cw, chh))
      }
      val (l0, c0, r0) = parts.head
      val (l1, c1, r1) =
        if (parts.size == 2) parts(1) else (null, null, null)
      val unweighted = explicitW.isEmpty && (!implicitW || parts.size == 1)
      if (unweighted) {
        // fast path (no closures per pixel): copy or §8.4.2.1 average
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            val k = j * pw + i
            y((y0 + j) * ls + x0 + i) =
              if (l1 == null) l0(k) else (l0(k) + l1(k) + 1) >> 1
            i += 1
          }
          j += 1
        }
        j = 0
        while (j < chh) {
          var i = 0
          while (i < cw) {
            val k = j * cw + i
            cb((cy0 + j) * cs + cx0 + i) =
              if (c1 == null) c0(k) else (c0(k) + c1(k) + 1) >> 1
            cr((cy0 + j) * cs + cx0 + i) =
              if (r1 == null) r0(k) else (r0(k) + r1(k) + 1) >> 1
            i += 1
          }
          j += 1
        }
        return
      }
      val (mixY, mixCb, mixCr) = Weighting.mixers(
        preds.map(p => (p._1, p._2)), explicitW, implicitW, slicePoc,
        (list, ref) => (if (list == 0) refs0 else refs1)(ref).poc,
        (list, ref) => (if (list == 0) refs0 else refs1)(ref).longTerm)
      @inline def px(b: Array[Int], i: Int): Int = if (b == null) 0 else b(i)
      var j = 0
      while (j < ph) {
        var i = 0
        while (i < pw) {
          y((y0 + j) * ls + x0 + i) = mixY(l0(j * pw + i), px(l1, j * pw + i))
          i += 1
        }
        j += 1
      }
      j = 0
      while (j < chh) {
        var i = 0
        while (i < cw) {
          cb((cy0 + j) * cs + cx0 + i) = mixCb(c0(j * cw + i), px(c1, j * cw + i))
          cr((cy0 + j) * cs + cx0 + i) = mixCr(r0(j * cw + i), px(r1, j * cw + i))
          i += 1
        }
        j += 1
      }
    }

    // --------------------------------------------------------- B slices

    /** Direct motion for this MB (§8.4.1.2, spatial or temporal per the
      * slice header flag): the co-located picture is RefPicList1[0].
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
      if (directSpatial)
        BDirect.spatial(bstate.neigh(0), bstate.neigh(1), mbX * 4, mbY * 4,
          col, sps.direct8x8Inference, colShortTerm = !refs1.head.longTerm)
      else
        BDirect.temporal(col,
          picId => refs0.indexWhere(_.picId == picId),
          idx => refs0(idx).poc, idx => refs0(idx).longTerm,
          refs1.head.poc, slicePoc, sps.direct8x8Inference)
    }

    /** Commit + motion-compensate direct motion over the 8×8 quadrants
      * selected by `quadMask` (bit e8). Per-4×4 MC — colZeroFlag varies
      * block by block.
      */
    private def applyDirect(mbX: Int, mbY: Int, dm: BDirect.DirectMotion,
        quadMask: Int): Unit = {
      var blk = 0
      while (blk < 16) {
        val bx = blk & 3; val by = blk >> 2
        val e8 = (by >> 1) * 2 + (bx >> 1)
        if ((quadMask & (1 << e8)) != 0) {
          val r0 = dm.ref0(blk)
          val r1 = dm.ref1(blk)
          require(r0 < math.max(refs0.size, 1) && r1 < math.max(refs1.size, 1),
            "direct reference outside the lists")
          val gbx = mbX * 4 + bx
          val gby = mbY * 4 + by
          if (r0 >= 0)
            bstate.setBlocks(0, gbx, gby, 1, 1, r0, refs0(r0).picId,
              dm.mv0x(blk), dm.mv0y(blk))
          else bstate.setBlocks(0, gbx, gby, 1, 1, -1, -1, 0, 0)
          if (r1 >= 0)
            bstate.setBlocks(1, gbx, gby, 1, 1, r1, refs1(r1).picId,
              dm.mv1x(blk), dm.mv1y(blk))
          else bstate.setBlocks(1, gbx, gby, 1, 1, -1, -1, 0, 0)
          val preds = Seq.newBuilder[(Int, Int, Int, Int)]
          if (r0 >= 0) preds += ((0, r0, dm.mv0x(blk), dm.mv0y(blk)))
          if (r1 >= 0) preds += ((1, r1, dm.mv1x(blk), dm.mv1y(blk)))
          writeInterPredMulti(mbX * 16 + bx * 4, mbY * 16 + by * 4, 4, 4,
            preds.result())
        }
        blk += 1
      }
    }

    private def decodeBSkip(mbX: Int, mbY: Int): Unit = {
      bstate.beginMb(mbX, mbY)
      applyDirect(mbX, mbY, directMotion(mbX, mbY), 0xF)
      // no residual, no qp change; CAVLC contexts read 0
      mbQp(mbY * wMb + mbX) = qp
    }

    /** B partition list usage per Table 7-14, mb_type 1..21: bit 0 = L0,
      * bit 1 = L1 per partition.
      */
    private def bUsage(mbType: Int): (Seq[(Int, Int, Int, Int, Char)], Seq[Int]) =
      mbType match {
        case 1 => (partitions(0), Seq(1)) // B_L0_16x16
        case 2 => (partitions(0), Seq(2)) // B_L1_16x16
        case 3 => (partitions(0), Seq(3)) // B_Bi_16x16
        case t if t >= 4 && t <= 21 =>
          val geom = partitions(1 + ((t - 4) & 1)) // even: 16x8, odd: 8x16
          val pair = Seq((1, 1), (2, 2), (1, 2), (2, 1), (1, 3), (2, 3),
            (3, 1), (3, 2), (3, 3))((t - 4) >> 1)
          (geom, Seq(pair._1, pair._2))
        case t => throw new IllegalArgumentException(s"B mb_type $t")
      }

    private def decodeBMb(br: BitReader, mbType: Int, mbX: Int, mbY: Int): Unit = {
      if (mbType == 22) { decodeB8x8(br, mbX, mbY); return }
      if (mbType == 0) { // B_Direct_16x16: direct motion + coded residual
        applyDirect(mbX, mbY, directMotion(mbX, mbY), 0xF)
        decodeInterResidual(br, mbX, mbY)
        return
      }
      val (parts, usage) = bUsage(mbType)
      // §7.3.5.1 parse order: all ref_idx_l0, all ref_idx_l1, all
      // mvd_l0, all mvd_l1 — derivation then runs per partition per
      // list against the committed state of EARLIER partitions
      val ref0 = usage.map(u => if ((u & 1) != 0) teRef(br, numRefActive0) else -1)
      val ref1 = usage.map(u => if ((u & 2) != 0) teRef(br, numRefActive1) else -1)
      val mvd0 = usage.map(u => if ((u & 1) != 0) (br.se(), br.se()) else (0, 0))
      val mvd1 = usage.map(u => if ((u & 2) != 0) (br.se(), br.se()) else (0, 0))
      parts.indices.foreach { pi =>
        val (px, py, pw, ph, shape) = parts(pi)
        val bx = mbX * 4 + px / 4
        val by = mbY * 4 + py / 4
        val preds = Seq.newBuilder[(Int, Int, Int, Int)]
        for (list <- 0 to 1) {
          val r = if (list == 0) ref0(pi) else ref1(pi)
          if (r >= 0) {
            require(r < (if (list == 0) refs0 else refs1).size,
              s"ref_idx_l$list $r outside DPB")
            val (prX, prY) =
              MvPred.predict(bstate.neigh(list), bx, by, pw / 4, r, shape)
            val (dx, dy) = if (list == 0) mvd0(pi) else mvd1(pi)
            val mvx = prX + dx
            val mvy = prY + dy
            val pic = (if (list == 0) refs0 else refs1)(r).picId
            bstate.setBlocks(list, bx, by, pw / 4, ph / 4, r, pic, mvx, mvy)
            preds += ((list, r, mvx, mvy))
          } else {
            bstate.setBlocks(list, bx, by, pw / 4, ph / 4, -1, -1, 0, 0)
          }
        }
        writeInterPredMulti(mbX * 16 + px, mbY * 16 + py, pw, ph, preds.result())
      }
      decodeInterResidual(br, mbX, mbY)
    }

    /** B sub-partition geometry + usage per Table 7-17 (0 = direct). */
    private def bSubGeom(t: Int): (Seq[(Int, Int, Int, Int)], Int) = t match {
      case 1 => (Seq((0, 0, 8, 8)), 1)
      case 2 => (Seq((0, 0, 8, 8)), 2)
      case 3 => (Seq((0, 0, 8, 8)), 3)
      case 4 => (Seq((0, 0, 8, 4), (0, 4, 8, 4)), 1)
      case 5 => (Seq((0, 0, 4, 8), (4, 0, 4, 8)), 1)
      case 6 => (Seq((0, 0, 8, 4), (0, 4, 8, 4)), 2)
      case 7 => (Seq((0, 0, 4, 8), (4, 0, 4, 8)), 2)
      case 8 => (Seq((0, 0, 8, 4), (0, 4, 8, 4)), 3)
      case 9 => (Seq((0, 0, 4, 8), (4, 0, 4, 8)), 3)
      case 10 => (Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)), 1)
      case 11 => (Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)), 2)
      case 12 => (Seq((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)), 3)
      case t => throw new IllegalArgumentException(s"B sub_mb_type $t")
    }

    private def decodeB8x8(br: BitReader, mbX: Int, mbY: Int): Unit = {
      val subTypes = (0 until 4).map(_ => br.ue())
      subTypes.foreach(t => require(t <= 12, s"B sub_mb_type $t"))
      def usageOf(t: Int): Int = if (t == 0) 0 else bSubGeom(t)._2
      // parse order: ref_idx_l0 per non-direct 8x8 using L0, then l1,
      // then mvd_l0 per sub-partition, then mvd_l1
      val ref0 = subTypes.map(t =>
        if ((usageOf(t) & 1) != 0) teRef(br, numRefActive0) else -1)
      val ref1 = subTypes.map(t =>
        if ((usageOf(t) & 2) != 0) teRef(br, numRefActive1) else -1)
      val mvd0 = subTypes.map(t =>
        if ((usageOf(t) & 1) != 0) bSubGeom(t)._1.map(_ => (br.se(), br.se()))
        else Seq.empty)
      val mvd1 = subTypes.map(t =>
        if ((usageOf(t) & 2) != 0) bSubGeom(t)._1.map(_ => (br.se(), br.se()))
        else Seq.empty)
      // direct derivation is MB-level (neighbors of the MB, outside it) —
      // compute once, valid for every direct quadrant
      lazy val dm = directMotion(mbX, mbY)
      for (e8 <- 0 until 4) {
        val ox = (e8 & 1) * 8
        val oy = (e8 >> 1) * 8
        if (subTypes(e8) == 0) {
          applyDirect(mbX, mbY, dm, 1 << e8)
        } else {
          val (geom, usage) = bSubGeom(subTypes(e8))
          geom.zipWithIndex.foreach { case ((sx, sy, sw, sh), si) =>
            val px = ox + sx; val py = oy + sy
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            val preds = Seq.newBuilder[(Int, Int, Int, Int)]
            for (list <- 0 to 1) {
              val r = if (list == 0) ref0(e8) else ref1(e8)
              if ((usage & (1 << list)) != 0) {
                require(r < (if (list == 0) refs0 else refs1).size,
                  s"ref_idx_l$list $r outside DPB")
                val (prX, prY) =
                  MvPred.predict(bstate.neigh(list), bx, by, sw / 4, r)
                val (dx, dy) = (if (list == 0) mvd0(e8) else mvd1(e8))(si)
                val mvx = prX + dx
                val mvy = prY + dy
                val pic = (if (list == 0) refs0 else refs1)(r).picId
                bstate.setBlocks(list, bx, by, sw / 4, sh / 4, r, pic, mvx, mvy)
                preds += ((list, r, mvx, mvy))
              } else {
                bstate.setBlocks(list, bx, by, sw / 4, sh / 4, -1, -1, 0, 0)
              }
            }
            writeInterPredMulti(mbX * 16 + px, mbY * 16 + py, sw, sh, preds.result())
          }
        }
      }
      decodeInterResidual(br, mbX, mbY)
    }

    /** Inter-MB residual tail: cbp, qp delta, luma 4×4 blocks, chroma. */
    private def decodeInterResidual(br: BitReader, mbX: Int, mbY: Int): Unit = {
      val cbpCode = br.ue()
      require(cbpCode < 48, s"coded_block_pattern code $cbpCode")
      val cbp = CbpInter(cbpCode)
      if (cbp != 0) bumpQp(br.se())
      decodeLumaResidual4x4(br, mbX, mbY, cbp & 15)
      val chroma = parseChromaResidual(br, mbX, mbY, cbp >> 4)
      addChromaResidual(mbX, mbY, chroma)
    }

    /** Luma residual for non-I16 MBs: 16 blocks of 16 coeffs gated by the
      * cbp 8x8 groups, added onto the already-written prediction.
      */
    private def decodeLumaResidual4x4(br: BitReader, mbX: Int, mbY: Int,
        cbpLuma: Int): Unit = {
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        if ((cbpLuma & (1 << (i >> 2))) != 0) {
          val blk = Cavlc.decodeBlock(br, lumaNC(gbx, gby), 16)
          tcY(gby * wMb * 4 + gbx) = blk.totalCoeff
          val res = Transform.inverse4x4(
            Transform.dequant4x4(unzigzag(blk.coeffs, 0), qp, skipDc = false))
          addResidual4x4(y, ls, mbX * 16 + blkX(i) * 4, mbY * 16 + blkY(i) * 4, res)
        } else {
          tcY(gby * wMb * 4 + gbx) = 0
        }
        i += 1
      }
    }

    // ------------------------------------------------------------ intra

    private def decodePcm(br: BitReader, mbX: Int, mbY: Int): Unit = {
      br.alignToByte()
      val x0 = mbX * 16; val y0 = mbY * 16
      for (yy <- 0 until 16; xx <- 0 until 16)
        y((y0 + yy) * ls + x0 + xx) = br.u(8)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for (yy <- 0 until 8; xx <- 0 until 8) cb((cy0 + yy) * cs + cx0 + xx) = br.u(8)
      for (yy <- 0 until 8; xx <- 0 until 8) cr((cy0 + yy) * cs + cx0 + xx) = br.u(8)
      for (by <- 0 until 4; bx <- 0 until 4)
        tcY((mbY * 4 + by) * wMb * 4 + mbX * 4 + bx) = 16
      for (by <- 0 until 2; bx <- 0 until 2) {
        tcCb((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = 16
        tcCr((mbY * 2 + by) * wMb * 2 + mbX * 2 + bx) = 16
      }
    }

    private def lumaNeighbors(sx: Int, sy: Int, mbX: Int, mbY: Int,
        blkIdxInMb: Int): (Array[Int], Array[Int], Int, Boolean, Boolean) = {
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
            blkX(blkIdxInMb), blkY(blkIdxInMb))
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
      val cAvail = availU && availL &&
        bstate.mbAvail((sx - 1) / 16, (sy - 1) / 16)
      if (cAvail) c = y((sy - 1) * ls + sx - 1)
      else if (availU) c = u(0)
      else if (availL) c = l(0)
      (u, l, c, availU, availL)
    }

    private def mortonLt(bx: Int, by: Int, curBx: Int, curBy: Int): Boolean = {
      def code(x: Int, yy: Int) =
        ((yy >> 1) << 3) | ((x >> 1) << 2) | ((yy & 1) << 1) | (x & 1)
      code(bx, by) < code(curBx, curBy)
    }

    private def decodeI4x4(br: BitReader, mbX: Int, mbY: Int): Unit = {
      val modes = new Array[Int](16)
      var i = 0
      while (i < 16) {
        val gbx = mbX * 4 + blkX(i)
        val gby = mbY * 4 + blkY(i)
        // §8.3.1.1: DC if either neighbor block is unavailable; otherwise
        // Min of the neighbor modes (non-I_4x4 neighbor MB reads as DC)
        val pred =
          if (!lumaBlkAvail(gbx - 1, gby) || !lumaBlkAvail(gbx, gby - 1)) 2
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
      reconChromaIntra(mbX, mbY, chromaMode, chroma)
    }

    private def decodeI16x16(br: BitReader, typeIdx: Int, mbX: Int, mbY: Int): Unit = {
      val predMode = typeIdx % 4
      val cbpChroma = (typeIdx / 4) % 3
      val cbpLuma = if (typeIdx >= 12) 15 else 0
      val chromaMode = br.ue()
      require(chromaMode <= 3, s"intra_chroma_pred_mode $chromaMode")
      bumpQp(br.se())

      val dcBlk = Cavlc.decodeBlock(br, lumaNC(mbX * 4, mbY * 4), 16)
      val dcScaled = Transform.dequantLumaDc(unzigzag(dcBlk.coeffs, 0), qp)

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

      val sx0 = mbX * 16; val sy0 = mbY * 16
      val (u, l, c, aU, aL) = gatherEdge(y, ls, sx0, sy0, 16, mbX, mbY)
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
      reconChromaIntra(mbX, mbY, chromaMode, chroma)
    }

    // ----------------------------------------------------------- chroma

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

    /** Intra chroma: predict the 8×8 then add residual. */
    private def reconChromaIntra(mbX: Int, mbY: Int, chromaMode: Int,
        res: (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]])): Unit = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for (plane <- Seq(cb, cr)) {
        val (u, l, c, aU, aL) = gatherEdge(plane, cs, cx0, cy0, 8, mbX, mbY)
        Predict.chroma8x8(chromaMode, plane, cs, cx0, cy0, u, l, c, aU, aL)
      }
      addChromaResidual(mbX, mbY, res)
    }

    /** Add dequantized chroma residual onto whatever prediction the
      * planes already hold (intra prediction or motion compensation).
      */
    private def addChromaResidual(mbX: Int, mbY: Int,
        res: (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]])): Unit = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      for ((plane, dc, ac, qpC) <- Seq(
        (cb, res._1, res._3, Transform.chromaQp(qp, pps.chromaQpOffset)),
        (cr, res._2, res._4, Transform.chromaQp(qp, pps.crQpOffset)))) {
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

    /** Edge samples for 16×16 / chroma 8×8 intra prediction at the MB
      * (mbX, mbY); availability is slice-masked per §6.4.8.
      */
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

    private def unzigzag(scan: Array[Int], from: Int): Array[Int] = {
      val out = new Array[Int](16)
      var i = from
      while (i < 16) { out(Transform.Zigzag(i)) = scan(i - from); i += 1 }
      out
    }

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
