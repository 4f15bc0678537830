package graft.multimodal.h264

/** Motion-vector prediction (ITU-T H.264 §8.4.1.3), shared verbatim by
  * decoder and encoder (an encoder that predicts differently writes
  * undecodable mvd).
  *
  * Neighbor state is queried at 4×4-block granularity through `Neigh`
  * with frame-absolute block coords:
  *  - `None` — block unavailable (outside the picture / not yet decoded);
  *  - `Some((-1, 0, 0))` — block available but carries no L0 motion
  *    (intra-coded): participates in availability rules, never in
  *    same-reference matching, contributes (0,0) to the median;
  *  - `Some((ref, mvx, mvy))` — inter block, MV in quarter-pel units.
  */
object MvPred {

  type Neigh = (Int, Int) => Option[(Int, Int, Int)]

  /** Median MV predictor for a partition whose top-left 4×4 block is
    * (bx, by) and spans w4 blocks horizontally, predicting against
    * `refIdx`. `shape` selects the §8.4.1.3 directional special cases:
    * 'T'/'B' = 16×8 top/bottom, 'L'/'R' = 8×16 left/right, ' ' = none.
    */
  def predict(neigh: Neigh, bx: Int, by: Int, w4: Int,
      refIdx: Int, shape: Char = ' '): (Int, Int) = {
    val a = neigh(bx - 1, by) // left of top-left sample
    val b = neigh(bx, by - 1) // above
    val cRaw = neigh(bx + w4, by - 1) // above-right
    val d = neigh(bx - 1, by - 1) // above-left (C's substitute)
    val c = if (cRaw.isDefined) cRaw else d

    def mvOf(n: Option[(Int, Int, Int)]): (Int, Int) =
      n.map { case (_, x, y) => (x, y) }.getOrElse((0, 0))
    def sameRef(n: Option[(Int, Int, Int)]): Boolean = n.exists(_._1 == refIdx)

    // directional preferences (16x8 / 8x16) take precedence when the
    // preferred neighbor predicts from the same reference
    shape match {
      case 'T' if sameRef(b) => return mvOf(b)
      case 'B' if sameRef(a) => return mvOf(a)
      case 'L' if sameRef(a) => return mvOf(a)
      case 'R' if sameRef(c) => return mvOf(c)
      case _ =>
    }

    // §8.4.1.3.1 edge rule: B, C (and its substitute D) unavailable while
    // A is available → A's MV regardless of reference
    if (b.isEmpty && c.isEmpty && a.isDefined) return mvOf(a)

    // exactly one neighbor predicting from the same reference → its MV
    val same = Seq(a, b, c).filter(sameRef)
    if (same.size == 1) return mvOf(same.head)

    // component-wise median (unavailable / intra → (0,0))
    val (ax, ay) = mvOf(a); val (bx2, by2) = mvOf(b); val (cx, cy) = mvOf(c)
    (median(ax, bx2, cx), median(ay, by2, cy))
  }

  /** P_Skip MV derivation (§8.4.1.1): zero when the left or above
    * NEIGHBOR BLOCK is unavailable, or when either is an inter block
    * referencing picture 0 with a zero MV; otherwise the standard 16×16
    * ref-0 predictor. (An intra neighbor is available but not zero-ref —
    * it routes to the predictor.)
    */
  def skipMv(neigh: Neigh, bx: Int, by: Int): (Int, Int) = {
    val a = neigh(bx - 1, by)
    val b = neigh(bx, by - 1)
    if (a.isEmpty || b.isEmpty) return (0, 0)
    def zeroRef0(n: Option[(Int, Int, Int)]): Boolean =
      n.exists { case (r, x, y) => r == 0 && x == 0 && y == 0 }
    if (zeroRef0(a) || zeroRef0(b)) (0, 0)
    else predict(neigh, bx, by, 4, 0)
  }

  private def median(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(math.max(a, b), c))
}
