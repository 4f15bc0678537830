package graft.multimodal.h264

/** B-slice direct-mode motion derivation (ITU-T H.264 §8.4.1.2),
  * SPATIAL mode (direct_spatial_mv_pred_flag = 1 — the x264/ffmpeg
  * default; temporal direct fails fast at the slice header). Shared
  * verbatim by decoder and encoder — an encoder that derived direct
  * motion differently would write undecodable B_Skip/B_Direct MBs.
  */
object BDirect {

  /** Per-MB direct motion: list reference indices (−1 = list unused)
    * plus per-4×4 MVs (16 blocks, raster (by*4+bx) within the MB —
    * colZeroFlag varies per block, the refs do not).
    */
  final case class DirectMotion(ref0: Int, ref1: Int,
      mv0x: Array[Int], mv0y: Array[Int],
      mv1x: Array[Int], mv1y: Array[Int])

  /** Spatial direct (§8.4.1.2.2 + §8.4.1.2.3): MinPositive reference
    * selection over the MB neighbors A/B/C (C falls back to D), 16×16
    * median MV prediction per list, then per-4×4 colZeroFlag refinement
    * against the co-located motion of RefPicList1[0].
    *
    * `col(blkIdx)` returns the co-located 4×4 block's (refIdxCol, mvx,
    * mvy) with refIdxCol already collapsed per the spec (its L0 if
    * present, else its L1; −1 for intra). `inference8x8` =
    * direct_8x8_inference_flag: each 8×8 reads its outer-corner block's
    * co-located motion instead of its own.
    */
  def spatial(n0: MvPred.Neigh, n1: MvPred.Neigh, bx0: Int, by0: Int,
      col: Int => (Int, Int, Int), inference8x8: Boolean,
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
      val bx = blk & 3; val by = blk >> 2
      val colBlk =
        if (inference8x8) (3 * (by >> 1)) * 4 + 3 * (bx >> 1) else blk
      val (colRef, colMx, colMy) = col(colBlk)
      // a long-term co-located picture never yields colZeroFlag (§8.4.1.2.2)
      val colZero = !zeroPred && colShortTerm && colRef == 0 &&
        colMx >= -1 && colMx <= 1 && colMy >= -1 && colMy <= 1
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
    DirectMotion(ref0, ref1, mv0x, mv0y, mv1x, mv1y)
  }
}
