package graft.multimodal.h264

/** B-slice direct-mode motion derivation (ITU-T H.264 §8.4.1.2), both
  * SPATIAL mode (direct_spatial_mv_pred_flag = 1 — the x264/ffmpeg
  * default) and TEMPORAL mode (flag = 0 — the JM default): shared
  * verbatim by decoder and encoder — an encoder that derived direct
  * motion differently would write undecodable B_Skip/B_Direct MBs.
  */
object BDirect {

  /** Per-MB direct motion, per 4×4 block (raster (by*4+bx) within the
    * MB): list reference indices (−1 = list unused for that block) and
    * MVs. Spatial mode varies only the MVs per block (colZeroFlag);
    * temporal mode also varies refIdxL0 (the co-located reference maps
    * block by block).
    */
  final case class DirectMotion(ref0: Array[Int], ref1: Array[Int],
      mv0x: Array[Int], mv0y: Array[Int],
      mv1x: Array[Int], mv1y: Array[Int])

  /** One co-located 4×4 block's motion: the PICTURE id it references
    * (−1 for intra), its list index in the co-located picture's own
    * slice (colZeroFlag compares against 0), and its MV — L0 if
    * present, else L1, per the spec's refIdxCol collapse.
    */
  final case class ColBlock(refPicId: Int, refIdxCol: Int, mvx: Int, mvy: Int)

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Map a within-MB 4×4 block index to the one examined in the
    * co-located picture (direct_8x8_inference: the 8×8's outer corner).
    */
  @inline def colBlkIdx(blk: Int, inference8x8: Boolean): Int =
    if (inference8x8) (3 * ((blk >> 2) >> 1)) * 4 + 3 * ((blk & 3) >> 1)
    else blk

  /** Spatial direct (§8.4.1.2.2 + §8.4.1.2.3): MinPositive reference
    * selection over the MB neighbors A/B/C (C falls back to D), 16×16
    * median MV prediction per list, then per-4×4 colZeroFlag refinement
    * against the co-located motion of RefPicList1[0].
    */
  def spatial(n0: MvPred.Neigh, n1: MvPred.Neigh, bx0: Int, by0: Int,
      col: Int => ColBlock, inference8x8: Boolean,
      colShortTerm: Boolean = true): DirectMotion = {
    def refOf(n: MvPred.Neigh): Int = {
      val a = n(bx0 - 1, by0)
      val b = n(bx0, by0 - 1)
      val cRaw = n(bx0 + 4, by0 - 1)
      val c = if (cRaw.isDefined) cRaw else n(bx0 - 1, by0 - 1)
      def r(x: Option[(Int, Int, Int)]): Int = x.map(_._1).getOrElse(-1)
      def minPos(p: Int, q: Int): Int =
        if (p >= 0 && q >= 0) math.min(p, q) else math.max(p, q)
      minPos(minPos(r(a), r(b)), r(c))
    }
    var ref0 = refOf(n0)
    var ref1 = refOf(n1)
    // directZeroPredictionFlag: no neighbor motion at all → both lists
    // reference index 0 with zero MVs, colZeroFlag ignored
    val zeroPred = ref0 < 0 && ref1 < 0
    if (zeroPred) { ref0 = 0; ref1 = 0 }
    val (p0x, p0y) =
      if (zeroPred || ref0 < 0) (0, 0) else MvPred.predict(n0, bx0, by0, 4, ref0)
    val (p1x, p1y) =
      if (zeroPred || ref1 < 0) (0, 0) else MvPred.predict(n1, bx0, by0, 4, ref1)
    val mv0x = new Array[Int](16); val mv0y = new Array[Int](16)
    val mv1x = new Array[Int](16); val mv1y = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val cb = col(colBlkIdx(blk, inference8x8))
      // a long-term co-located picture never yields colZeroFlag (§8.4.1.2.2)
      val colZero = !zeroPred && colShortTerm && cb.refPicId >= 0 &&
        cb.refIdxCol == 0 &&
        cb.mvx >= -1 && cb.mvx <= 1 && cb.mvy >= -1 && cb.mvy <= 1
      if (ref0 >= 0) {
        if (colZero && ref0 == 0) { mv0x(blk) = 0; mv0y(blk) = 0 }
        else { mv0x(blk) = p0x; mv0y(blk) = p0y }
      }
      if (ref1 >= 0) {
        if (colZero && ref1 == 0) { mv1x(blk) = 0; mv1y(blk) = 0 }
        else { mv1x(blk) = p1x; mv1y(blk) = p1y }
      }
      blk += 1
    }
    DirectMotion(Array.fill(16)(ref0), Array.fill(16)(ref1),
      mv0x, mv0y, mv1x, mv1y)
  }

  /** Temporal direct (§8.4.1.2.3): per 4×4 block, refIdxL0 is the
    * lowest current-L0 index referencing the PICTURE the co-located
    * block predicted from; the co-located MV splits between the lists
    * by POC-distance scaling (mvL0 = (DistScaleFactor·mvCol + 128) >> 8,
    * mvL1 = mvL0 − mvCol); refIdxL1 is 0. A long-term L0 reference or a
    * zero POC span copies mvCol unscaled. An intra co-located block
    * contributes refIdxL0 = 0 with a zero MV (the refIdxCol = 0 / mvCol
    * = 0 rule). Fails fast by name if the co-located reference picture
    * is absent from the current L0 list (nonconformant stream).
    */
  def temporal(col: Int => ColBlock,
      l0IndexOfPic: Int => Int, l0Poc: Int => Int, l0IsLongTerm: Int => Boolean,
      colPicPoc: Int, currPoc: Int, inference8x8: Boolean): DirectMotion = {
    val ref0 = new Array[Int](16)
    val ref1 = new Array[Int](16) // all zeros: refIdxL1 = 0
    val mv0x = new Array[Int](16); val mv0y = new Array[Int](16)
    val mv1x = new Array[Int](16); val mv1y = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val cb = col(colBlkIdx(blk, inference8x8))
      val (r0, mvColX, mvColY, refPoc) =
        if (cb.refPicId < 0) (0, 0, 0, l0Poc(0)) // intra co-located block
        else {
          val idx = l0IndexOfPic(cb.refPicId)
          require(idx >= 0,
            "temporal direct: co-located reference picture not in RefPicList0")
          (idx, cb.mvx, cb.mvy, l0Poc(l0IndexOfPic(cb.refPicId)))
        }
      ref0(blk) = r0
      val td = clip3(-128, 127, colPicPoc - refPoc)
      if (l0IsLongTerm(r0) || td == 0) {
        mv0x(blk) = mvColX; mv0y(blk) = mvColY
        mv1x(blk) = 0; mv1y(blk) = 0
      } else {
        val tb = clip3(-128, 127, currPoc - refPoc)
        val tx = (16384 + math.abs(td / 2)) / td
        val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
        mv0x(blk) = (dsf * mvColX + 128) >> 8
        mv0y(blk) = (dsf * mvColY + 128) >> 8
        mv1x(blk) = mv0x(blk) - mvColX
        mv1y(blk) = mv0y(blk) - mvColY
      }
      blk += 1
    }
    DirectMotion(ref0, ref1, mv0x, mv0y, mv1x, mv1y)
  }
}
