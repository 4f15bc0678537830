package graft.multimodal.h264

/** In-loop deblocking filter (ITU-T H.264 §8.7). Boundary strength per
  * 4×4 block pair comes from the caller ([[BlockState.boundaryStrength]]
  * — intra MB edges 4/3, coded-residual edges 2, MV/ref discontinuities
  * 1, else 0), so the same machinery serves all-intra frames and P
  * frames. MBs raster order, vertical edges left→right then horizontal
  * top→bottom, filtering in place (normative ordering: later edges see
  * earlier edges' filtered samples).
  */
object Deblock {

  private val Alpha: Array[Int] = Array.fill(16)(0) ++ Array(
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255)

  private val Beta: Array[Int] = Array.fill(16)(0) ++ Array(
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18)

  // tC0, Table 8-17, rows bS=1..3
  private val Tc0: Array[Array[Int]] = Array(
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13),
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
      2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17),
    Array.fill(16)(0) ++ Array(0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
      3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25))

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip1(v: Int): Int = Transform.clip255(v)

  /** Filter a full reconstructed frame in place with uniform (single-
    * slice) parameters. `bS(pbx,pby,qbx,qby,mbEdge)` yields the strength
    * for one 4×4 luma block pair.
    */
  def filterFrame(y: Array[Int], cb: Array[Int], cr: Array[Int],
      wMb: Int, hMb: Int, mbQp: Array[Int], chromaQpOffset: Int,
      alphaOff: Int, betaOff: Int,
      bS: (Int, Int, Int, Int, Boolean) => Int): Unit = {
    val n = wMb * hMb
    filterFramePerMb(y, cb, cr, wMb, hMb, mbQp, chromaQpOffset, chromaQpOffset,
      Array.fill(n)(alphaOff), Array.fill(n)(betaOff),
      new Array[Int](n), new Array[Int](n), bS)
  }

  /** §8.7 with PER-MACROBLOCK slice parameters (multi-slice pictures):
    * each MB filters its edges with ITS slice's offsets; a slice with
    * disable idc 1 filters nothing; idc 2 skips only the MB edges that
    * coincide with a slice boundary (`mbSlice` differs across the edge).
    */
  def filterFramePerMb(y: Array[Int], cb: Array[Int], cr: Array[Int],
      wMb: Int, hMb: Int, mbQp: Array[Int], cbQpOffset: Int, crQpOffset: Int,
      mbAlphaOff: Array[Int], mbBetaOff: Array[Int],
      mbDisable: Array[Int], mbSlice: Array[Int],
      bS: (Int, Int, Int, Int, Boolean) => Int): Unit = {
    val ls = wMb * 16
    val cs = wMb * 8
    var mbY = 0
    while (mbY < hMb) {
      var mbX = 0
      while (mbX < wMb) {
        val m = mbY * wMb + mbX
        val qpCur = mbQp(m)
        val aOff = mbAlphaOff(m)
        val bOff = mbBetaOff(m)
        // idc 1: this MB's slice filters nothing; idc 2: skip only the
        // MB edges shared with a DIFFERENT slice
        val enabled = mbDisable(m) != 1
        def crossSliceOk(otherMb: Int): Boolean =
          mbDisable(m) != 2 || mbSlice(otherMb) == mbSlice(m)
        def qpAvgL(otherMb: Int): Int = (mbQp(otherMb) + qpCur + 1) >> 1
        def cQpCb(q: Int): Int = Transform.chromaQp(q, cbQpOffset)
        def cQpCr(q: Int): Int = Transform.chromaQp(q, crQpOffset)

        if (enabled) {
          // ---- vertical edges, left to right
          if (mbX > 0 && crossSliceOk(m - 1)) {
            val qa = qpAvgL(m - 1)
            lumaEdge(y, ls, mbX * 16, mbY * 16, vertical = true, mbEdge = true,
              qa, aOff, bOff, bS)
            val qcb = (cQpCb(mbQp(m - 1)) + cQpCb(qpCur) + 1) >> 1
            val qcr = (cQpCr(mbQp(m - 1)) + cQpCr(qpCur) + 1) >> 1
            chromaEdge(cb, cs, mbX * 8, mbY * 8, vertical = true, mbEdge = true,
              qcb, aOff, bOff, bS)
            chromaEdge(cr, cs, mbX * 8, mbY * 8, vertical = true, mbEdge = true,
              qcr, aOff, bOff, bS)
          }
          var k = 4
          while (k < 16) {
            lumaEdge(y, ls, mbX * 16 + k, mbY * 16, vertical = true,
              mbEdge = false, qpCur, aOff, bOff, bS)
            k += 4
          }
          chromaEdge(cb, cs, mbX * 8 + 4, mbY * 8, vertical = true,
            mbEdge = false, cQpCb(qpCur), aOff, bOff, bS)
          chromaEdge(cr, cs, mbX * 8 + 4, mbY * 8, vertical = true,
            mbEdge = false, cQpCr(qpCur), aOff, bOff, bS)

          // ---- horizontal edges, top to bottom
          if (mbY > 0 && crossSliceOk(m - wMb)) {
            val qa = qpAvgL(m - wMb)
            lumaEdge(y, ls, mbX * 16, mbY * 16, vertical = false, mbEdge = true,
              qa, aOff, bOff, bS)
            val qcb = (cQpCb(mbQp(m - wMb)) + cQpCb(qpCur) + 1) >> 1
            val qcr = (cQpCr(mbQp(m - wMb)) + cQpCr(qpCur) + 1) >> 1
            chromaEdge(cb, cs, mbX * 8, mbY * 8, vertical = false, mbEdge = true,
              qcb, aOff, bOff, bS)
            chromaEdge(cr, cs, mbX * 8, mbY * 8, vertical = false, mbEdge = true,
              qcr, aOff, bOff, bS)
          }
          k = 4
          while (k < 16) {
            lumaEdge(y, ls, mbX * 16, mbY * 16 + k, vertical = false,
              mbEdge = false, qpCur, aOff, bOff, bS)
            k += 4
          }
          chromaEdge(cb, cs, mbX * 8, mbY * 8 + 4, vertical = false,
            mbEdge = false, cQpCb(qpCur), aOff, bOff, bS)
          chromaEdge(cr, cs, mbX * 8, mbY * 8 + 4, vertical = false,
            mbEdge = false, cQpCr(qpCur), aOff, bOff, bS)
        }

        mbX += 1
      }
      mbY += 1
    }
  }

  /** Convenience all-intra strength function (fixture/back-compat): MB
    * edges 4, internal edges 3.
    */
  def intraBs: (Int, Int, Int, Int, Boolean) => Int =
    (_, _, _, _, mbEdge) => if (mbEdge) 4 else 3

  /** One luma edge of 16 lines at (x0,y0). The 4×4 block pair (and so
    * bS) changes every 4 lines.
    */
  private def lumaEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      vertical: Boolean, mbEdge: Boolean, qp: Int, aOff: Int, bOff: Int,
      bS: (Int, Int, Int, Int, Boolean) => Int): Unit = {
    val indexA = clip3(0, 51, qp + aOff)
    val alpha = Alpha(indexA)
    val beta = Beta(clip3(0, 51, qp + bOff))
    if (alpha == 0 || beta == 0) return
    val step = if (vertical) 1 else stride
    val line = if (vertical) stride else 1
    var i = 0
    while (i < 16) {
      val (pbx, pby, qbx, qby) =
        if (vertical) (x0 / 4 - 1, (y0 + i) / 4, x0 / 4, (y0 + i) / 4)
        else ((x0 + i) / 4, y0 / 4 - 1, (x0 + i) / 4, y0 / 4)
      val s = bS(pbx, pby, qbx, qby, mbEdge)
      if (s > 0) {
        var l = 0
        while (l < 4) {
          filterLineLuma(plane, (y0 * stride + x0) + (i + l) * line, step, s,
            alpha, beta, indexA)
          l += 1
        }
      }
      i += 4
    }
  }

  /** One chroma edge of 8 lines; the underlying LUMA block pair changes
    * every 2 chroma lines.
    */
  private def chromaEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      vertical: Boolean, mbEdge: Boolean, qp: Int, aOff: Int, bOff: Int,
      bS: (Int, Int, Int, Int, Boolean) => Int): Unit = {
    val indexA = clip3(0, 51, qp + aOff)
    val alpha = Alpha(indexA)
    val beta = Beta(clip3(0, 51, qp + bOff))
    if (alpha == 0 || beta == 0) return
    val step = if (vertical) 1 else stride
    val line = if (vertical) stride else 1
    var i = 0
    while (i < 8) {
      val (pbx, pby, qbx, qby) =
        if (vertical) (x0 / 2 - 1, (y0 + i) / 2, x0 / 2, (y0 + i) / 2)
        else ((x0 + i) / 2, y0 / 2 - 1, (x0 + i) / 2, y0 / 2)
      val s = bS(pbx, pby, qbx, qby, mbEdge)
      if (s > 0) {
        var l = 0
        while (l < 2) {
          filterLineChroma(plane, (y0 * stride + x0) + (i + l) * line, step, s,
            alpha, beta, indexA)
          l += 1
        }
      }
      i += 2
    }
  }

  private def filterLineLuma(s: Array[Int], q0p: Int, step: Int, bS: Int,
      alpha: Int, beta: Int, indexA: Int): Unit = {
    val p0 = s(q0p - step); val p1 = s(q0p - 2 * step)
    val p2 = s(q0p - 3 * step); val p3 = s(q0p - 4 * step)
    val q0 = s(q0p); val q1 = s(q0p + step); val q2 = s(q0p + 2 * step)
    val q3 = s(q0p + 3 * step)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    val ap = math.abs(p2 - p0)
    val aq = math.abs(q2 - q0)
    if (bS == 4) {
      if (ap < beta && math.abs(p0 - q0) < (alpha >> 2) + 2) {
        s(q0p - step) = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        s(q0p - 2 * step) = (p2 + p1 + p0 + q0 + 2) >> 2
        s(q0p - 3 * step) = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
      } else {
        s(q0p - step) = (2 * p1 + p0 + q1 + 2) >> 2
      }
      if (aq < beta && math.abs(p0 - q0) < (alpha >> 2) + 2) {
        s(q0p) = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        s(q0p + step) = (q2 + q1 + q0 + p0 + 2) >> 2
        s(q0p + 2 * step) = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
      } else {
        s(q0p) = (2 * q1 + q0 + p1 + 2) >> 2
      }
    } else {
      val tc0 = Tc0(bS - 1)(indexA)
      val tc = tc0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      s(q0p - step) = clip1(p0 + delta)
      s(q0p) = clip1(q0 - delta)
      if (ap < beta)
        s(q0p - 2 * step) = p1 + clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
      if (aq < beta)
        s(q0p + step) = q1 + clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    }
  }

  private def filterLineChroma(s: Array[Int], q0p: Int, step: Int, bS: Int,
      alpha: Int, beta: Int, indexA: Int): Unit = {
    val p0 = s(q0p - step); val p1 = s(q0p - 2 * step)
    val q0 = s(q0p); val q1 = s(q0p + step)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    if (bS == 4) {
      s(q0p - step) = (2 * p1 + p0 + q1 + 2) >> 2
      s(q0p) = (2 * q1 + q0 + p1 + 2) >> 2
    } else {
      val tc = Tc0(bS - 1)(indexA) + 1
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      s(q0p - step) = clip1(p0 + delta)
      s(q0p) = clip1(q0 - delta)
    }
  }
}
