package graft.multimodal.h264

/** Per-frame 4×4-block motion state, shared by decoder and encoder:
  * feeds MV prediction (§8.4.1.3 neighbor queries), P_Skip / B direct
  * derivation, and the inter boundary-strength rules of the deblocking
  * filter (§8.7.2.1).
  *
  * Two reference lists (L0/L1). Per block and list, `refIdx`:
  * −2 = block not yet decoded, −1 = no motion for that list (intra, or
  * a one-list inter partition), ≥0 = reference index into that list.
  * `refPic` carries a session-global PICTURE id for the referenced
  * frame: reference lists are per-slice (reordering can differ between
  * slices of one picture), so deblocking must compare the referenced
  * pictures themselves, not list indices. MVs are quarter-pel.
  *
  * MB availability (§6.4.8): a neighbor macroblock is available to
  * prediction only if it lies inside the picture AND belongs to the
  * SAME slice as the current one. `mbSliceOf`/`curSlice` carry that:
  * [[beginMb]] stamps each MB with its slice index as decoding reaches
  * it, and [[neigh]]/[[mbAvail]] mask everything else out. Deblocking
  * ignores the mask — it runs once per picture over real coding modes.
  */
final class BlockState(wMb: Int, hMb: Int) {
  val w4: Int = wMb * 4
  val h4: Int = hMb * 4
  val refIdx: Array[Array[Int]] = Array(Array.fill(w4 * h4)(-2), Array.fill(w4 * h4)(-2))
  val refPic: Array[Array[Int]] = Array(Array.fill(w4 * h4)(-1), Array.fill(w4 * h4)(-1))
  val mvX: Array[Array[Int]] = Array(new Array[Int](w4 * h4), new Array[Int](w4 * h4))
  val mvY: Array[Array[Int]] = Array(new Array[Int](w4 * h4), new Array[Int](w4 * h4))

  /** Slice index that decoded each MB (−1 = not yet decoded). */
  val mbSliceOf: Array[Int] = Array.fill(wMb * hMb)(-1)
  var curSlice: Int = 0

  /** Stamp (mbX, mbY) as belonging to the current slice — call at the
    * start of each MB so within-MB partition prediction sees it.
    */
  def beginMb(mbX: Int, mbY: Int): Unit =
    mbSliceOf(mbY * wMb + mbX) = curSlice

  /** Is the MB at (mbX, mbY) available to prediction from the current
    * slice (§6.4.8: inside the picture, decoded, same slice)?
    */
  def mbAvail(mbX: Int, mbY: Int): Boolean =
    mbX >= 0 && mbY >= 0 && mbX < wMb && mbY < hMb &&
      mbSliceOf(mbY * wMb + mbX) == curSlice

  /** Set one list's motion over a block range. `pic` is the global
    * picture id of the referenced frame (−1 with ref = −1).
    */
  def setBlocks(list: Int, bx0: Int, by0: Int, bw: Int, bh: Int,
      ref: Int, pic: Int, mx: Int, my: Int): Unit = {
    var by = by0
    while (by < by0 + bh) {
      var bx = bx0
      while (bx < bx0 + bw) {
        val i = by * w4 + bx
        refIdx(list)(i) = ref
        refPic(list)(i) = pic
        mvX(list)(i) = mx
        mvY(list)(i) = my
        bx += 1
      }
      by += 1
    }
  }

  /** L0-only convenience (P slices): sets L0 and clears L1. */
  def setBlocks(bx0: Int, by0: Int, bw: Int, bh: Int,
      ref: Int, pic: Int, mx: Int, my: Int): Unit = {
    setBlocks(0, bx0, by0, bw, bh, ref, pic, mx, my)
    setBlocks(1, bx0, by0, bw, bh, -1, -1, 0, 0)
  }

  /** Mark a whole MB intra (no motion on either list). */
  def setIntraMb(mbX: Int, mbY: Int): Unit = {
    beginMb(mbX, mbY)
    setBlocks(0, mbX * 4, mbY * 4, 4, 4, -1, -1, 0, 0)
    setBlocks(1, mbX * 4, mbY * 4, 4, 4, -1, -1, 0, 0)
  }

  /** §8.4.1.3 neighbor view for one list (None = out of picture,
    * undecoded, or in a different slice).
    */
  def neigh(list: Int): MvPred.Neigh = (bx, by) =>
    if (bx < 0 || by < 0 || bx >= w4 || by >= h4) None
    else if (mbSliceOf((by / 4) * wMb + bx / 4) != curSlice) None
    else refIdx(list)(by * w4 + bx) match {
      case -2 => None
      case -1 => Some((-1, 0, 0))
      case r => Some((r, mvX(list)(by * w4 + bx), mvY(list)(by * w4 + bx)))
    }

  /** L0 view (P-slice call sites). */
  def neigh: MvPred.Neigh = neigh(0)

  /** Boundary strength for the edge between 4×4 luma blocks P and Q
    * (§8.7.2.1, frame-coded). Reference comparison is by PICTURE
    * identity across both lists, so per-slice list reorderings and
    * B-slice bi-prediction derive correctly.
    */
  def boundaryStrength(tcY: Array[Int])(
      pbx: Int, pby: Int, qbx: Int, qby: Int, mbEdge: Boolean): Int = {
    val p = pby * w4 + pbx
    val q = qby * w4 + qbx
    val pPic0 = refPic(0)(p); val pPic1 = refPic(1)(p)
    val qPic0 = refPic(0)(q); val qPic1 = refPic(1)(q)
    val pIntra = pPic0 < 0 && pPic1 < 0
    val qIntra = qPic0 < 0 && qPic1 < 0
    if (pIntra || qIntra) { if (mbEdge) 4 else 3 }
    else if (tcY(p) > 0 || tcY(q) > 0) 2
    else {
      // allocation-free over the per-list arrays — this runs per 4×4
      // edge pair across every frame
      @inline def far(lp: Int, lq: Int): Boolean =
        math.abs(mvX(lp)(p) - mvX(lq)(q)) >= 4 ||
          math.abs(mvY(lp)(p) - mvY(lq)(q)) >= 4
      val pn = (if (pPic0 >= 0) 1 else 0) + (if (pPic1 >= 0) 1 else 0)
      val qn = (if (qPic0 >= 0) 1 else 0) + (if (qPic1 >= 0) 1 else 0)
      if (pn != qn) 1
      else if (pn == 1) {
        val lp = if (pPic0 >= 0) 0 else 1
        val lq = if (qPic0 >= 0) 0 else 1
        if (refPic(lp)(p) != refPic(lq)(q)) 1
        else if (far(lp, lq)) 1 else 0
      } else if (!((pPic0 == qPic0 && pPic1 == qPic1) ||
        (pPic0 == qPic1 && pPic1 == qPic0))) 1 // different picture sets
      else if (pPic0 != pPic1) {
        // two distinct pictures: compare the vectors matched by picture
        if (pPic0 == qPic0) { if (far(0, 0) || far(1, 1)) 1 else 0 }
        else { if (far(0, 1) || far(1, 0)) 1 else 0 }
      } else {
        // both predict twice from the SAME picture: bS 0 iff one of the
        // two pairings keeps every component difference < 4
        val a = !far(0, 0) && !far(1, 1)
        val b = !far(0, 1) && !far(1, 0)
        if (a || b) 0 else 1
      }
    }
  }
}
