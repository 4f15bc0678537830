package graft.multimodal.h264

/** Weighted-sample prediction arithmetic (ITU-T H.264 §8.4.2.3), shared
  * verbatim by decoder and encoder: explicit per-reference weights
  * (P slices under weighted_pred_flag, B under weighted_bipred_idc 1)
  * and the implicit-by-POC bi-prediction weights (idc 2, x264's default
  * for B frames).
  */
object Weighting {

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip255(v: Int): Int = Transform.clip255(v)

  /** Single-list explicit weighting (§8.4.2.3.2, eq. 8-269/8-270). */
  def single(p: Int, w: Int, o: Int, logWD: Int): Int =
    if (logWD >= 1) clip255(((p * w + (1 << (logWD - 1))) >> logWD) + o)
    else clip255(p * w + o)

  /** Bi-predictive explicit weighting (eq. 8-271). */
  def bi(p0: Int, w0: Int, o0: Int, p1: Int, w1: Int, o1: Int, logWD: Int): Int =
    clip255(((p0 * w0 + p1 * w1 + (1 << logWD)) >> (logWD + 1)) +
      ((o0 + o1 + 1) >> 1))

  /** §8.4.2.3.1 implicit mode: (w0, w1) under logWD 5, zero offsets —
    * combine with [[bi]](…, logWD = 5). Defaults to 32/32 when the POC
    * geometry degenerates (td = 0) or the scale leaves [−64, 128].
    */
  def implicitWeights(currPoc: Int, poc0: Int, poc1: Int): (Int, Int) = {
    val td = clip3(-128, 127, poc1 - poc0)
    if (td == 0) return (32, 32)
    val tb = clip3(-128, 127, currPoc - poc0)
    val tx = (16384 + math.abs(td / 2)) / td
    val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    val w1 = dsf >> 2
    if (w1 < -64 || w1 > 128) (32, 32) else (64 - w1, w1)
  }

  /** Per-plane combine functions (luma, Cb, Cr) for ONE partition's
    * prediction(s) under the slice's weighting mode — shared by decoder
    * and encoder so both halves weight identically. `preds` carries the
    * partition's (list, refIdx) pairs (1 = uni, 2 = bi); `pocOf(list,
    * ref)` resolves reference POCs for implicit mode. Each function
    * takes (pixel0, pixel1) — pixel1 ignored for uni-prediction.
    */
  def mixers(preds: Seq[(Int, Int)],
      explicitW: Option[H264Decoder.WeightTable], implicitW: Boolean,
      currPoc: Int, pocOf: (Int, Int) => Int,
      isLongTerm: (Int, Int) => Boolean = (_, _) => false)
      : ((Int, Int) => Int, (Int, Int) => Int, (Int, Int) => Int) = {
    def weightOf(wt: H264Decoder.WeightTable, list: Int, ref: Int) =
      (if (list == 0) wt.l0 else wt.l1)(ref)
    (explicitW, preds.size) match {
      case (Some(wt), 1) =>
        val (list, ref) = preds.head
        val rw = weightOf(wt, list, ref)
        ((a, _) => single(a, rw.wY, rw.oY, wt.logWDy),
          (a, _) => single(a, rw.wCb, rw.oCb, wt.logWDc),
          (a, _) => single(a, rw.wCr, rw.oCr, wt.logWDc))
      case (Some(wt), _) =>
        val (la, ra) = preds.head
        val (lb, rb) = preds(1)
        val w0 = weightOf(wt, la, ra)
        val w1 = weightOf(wt, lb, rb)
        ((a, b) => bi(a, w0.wY, w0.oY, b, w1.wY, w1.oY, wt.logWDy),
          (a, b) => bi(a, w0.wCb, w0.oCb, b, w1.wCb, w1.oCb, wt.logWDc),
          (a, b) => bi(a, w0.wCr, w0.oCr, b, w1.wCr, w1.oCr, wt.logWDc))
      case (None, 2) if implicitW =>
        // §8.4.2.3.1: a long-term reference forces the 32/32 default
        val anyLt = isLongTerm(preds.head._1, preds.head._2) ||
          isLongTerm(preds(1)._1, preds(1)._2)
        val (w0, w1) =
          if (anyLt) (32, 32)
          else implicitWeights(currPoc,
            pocOf(preds.head._1, preds.head._2), pocOf(preds(1)._1, preds(1)._2))
        val f = (a: Int, b: Int) => bi(a, w0, 0, b, w1, 0, 5)
        (f, f, f)
      case (None, 2) =>
        val f = (a: Int, b: Int) => (a + b + 1) >> 1
        (f, f, f)
      case _ =>
        val f = (a: Int, _: Int) => a
        (f, f, f)
    }
  }
}
