package graft.multimodal.h264

/** Per-frame 4×4-block motion state, shared by decoder and encoder:
  * feeds MV prediction (§8.4.1.3 neighbor queries), P_Skip derivation,
  * and the inter boundary-strength rules of the deblocking filter
  * (§8.7.2.1). `refIdx` per block: −2 = not yet decoded, −1 = intra /
  * no L0 motion, ≥0 = L0 reference index; MVs in quarter-pel units.
  */
final class BlockState(wMb: Int, hMb: Int) {
  val w4: Int = wMb * 4
  val h4: Int = hMb * 4
  val refIdx: Array[Int] = Array.fill(w4 * h4)(-2)
  val mvX: Array[Int] = new Array[Int](w4 * h4)
  val mvY: Array[Int] = new Array[Int](w4 * h4)

  def setBlocks(bx0: Int, by0: Int, bw: Int, bh: Int,
      ref: Int, mx: Int, my: Int): Unit = {
    var by = by0
    while (by < by0 + bh) {
      var bx = bx0
      while (bx < bx0 + bw) {
        refIdx(by * w4 + bx) = ref
        mvX(by * w4 + bx) = mx
        mvY(by * w4 + bx) = my
        bx += 1
      }
      by += 1
    }
  }

  /** Mark a whole MB intra (no L0 motion). */
  def setIntraMb(mbX: Int, mbY: Int): Unit =
    setBlocks(mbX * 4, mbY * 4, 4, 4, -1, 0, 0)

  /** §8.4.1.3 neighbor view (None = out of picture or undecoded). */
  def neigh: MvPred.Neigh = (bx, by) =>
    if (bx < 0 || by < 0 || bx >= w4 || by >= h4) None
    else refIdx(by * w4 + bx) match {
      case -2 => None
      case -1 => Some((-1, 0, 0))
      case r => Some((r, mvX(by * w4 + bx), mvY(by * w4 + bx)))
    }

  /** Boundary strength for the edge between 4×4 luma blocks P and Q
    * (§8.7.2.1, frame-coded, single slice — reference indices compare
    * directly because both blocks share the one L0 list).
    */
  def boundaryStrength(tcY: Array[Int])(
      pbx: Int, pby: Int, qbx: Int, qby: Int, mbEdge: Boolean): Int = {
    val pIntra = refIdx(pby * w4 + pbx) == -1
    val qIntra = refIdx(qby * w4 + qbx) == -1
    if (pIntra || qIntra) { if (mbEdge) 4 else 3 }
    else if (tcY(pby * w4 + pbx) > 0 || tcY(qby * w4 + qbx) > 0) 2
    else {
      val p = pby * w4 + pbx
      val q = qby * w4 + qbx
      if (refIdx(p) != refIdx(q) ||
        math.abs(mvX(p) - mvX(q)) >= 4 || math.abs(mvY(p) - mvY(q)) >= 4) 1
      else 0
    }
  }
}
