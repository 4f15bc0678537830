package graft.multimodal.h264

/** In-loop deblocking filter (ITU-T H.264 §8.7) for the all-intra
  * subset: every MB-boundary edge has bS = 4 and every internal 4×4 edge
  * bS = 3, so the strength derivation collapses and only the §8.7.2.3/4
  * sample filters and the α/β/tC0 threshold machinery remain. MBs are
  * processed in raster order, vertical edges left→right then horizontal
  * top→bottom, filtering in place (later edges see earlier edges'
  * filtered samples — normative ordering).
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

  /** Filter a full reconstructed frame in place. `mbQp` holds each MB's
    * final luma QP; `alphaOff`/`betaOff` are the slice header offsets
    * (already doubled).
    */
  def filterFrame(y: Array[Int], cb: Array[Int], cr: Array[Int],
      wMb: Int, hMb: Int, mbQp: Array[Int], chromaQpOffset: Int,
      alphaOff: Int, betaOff: Int): Unit = {
    val ls = wMb * 16
    val cs = wMb * 8
    var mbY = 0
    while (mbY < hMb) {
      var mbX = 0
      while (mbX < wMb) {
        val qpCur = mbQp(mbY * wMb + mbX)
        def qpAvg(otherMb: Int): Int = (mbQp(otherMb) + qpCur + 1) >> 1
        def cQp(q: Int): Int = Transform.chromaQp(q, chromaQpOffset)

        // ---- vertical edges (filter across columns), left to right
        // MB edge (x=0): bS=4, qp averaged with left MB
        if (mbX > 0) {
          val qa = qpAvg(mbY * wMb + mbX - 1)
          lumaEdge(y, ls, mbX * 16, mbY * 16, vertical = true, bS = 4, qa, alphaOff, betaOff)
          val qc = (cQp(mbQp(mbY * wMb + mbX - 1)) + cQp(qpCur) + 1) >> 1
          chromaEdge(cb, cs, mbX * 8, mbY * 8, vertical = true, bS = 4, qc, alphaOff, betaOff)
          chromaEdge(cr, cs, mbX * 8, mbY * 8, vertical = true, bS = 4, qc, alphaOff, betaOff)
        }
        // internal vertical edges: bS=3, qp of this MB
        var k = 4
        while (k < 16) {
          lumaEdge(y, ls, mbX * 16 + k, mbY * 16, vertical = true, bS = 3, qpCur, alphaOff, betaOff)
          k += 4
        }
        chromaEdge(cb, cs, mbX * 8 + 4, mbY * 8, vertical = true, bS = 3, cQp(qpCur), alphaOff, betaOff)
        chromaEdge(cr, cs, mbX * 8 + 4, mbY * 8, vertical = true, bS = 3, cQp(qpCur), alphaOff, betaOff)

        // ---- horizontal edges, top to bottom
        if (mbY > 0) {
          val qa = qpAvg((mbY - 1) * wMb + mbX)
          lumaEdge(y, ls, mbX * 16, mbY * 16, vertical = false, bS = 4, qa, alphaOff, betaOff)
          val qc = (cQp(mbQp((mbY - 1) * wMb + mbX)) + cQp(qpCur) + 1) >> 1
          chromaEdge(cb, cs, mbX * 8, mbY * 8, vertical = false, bS = 4, qc, alphaOff, betaOff)
          chromaEdge(cr, cs, mbX * 8, mbY * 8, vertical = false, bS = 4, qc, alphaOff, betaOff)
        }
        k = 4
        while (k < 16) {
          lumaEdge(y, ls, mbX * 16, mbY * 16 + k, vertical = false, bS = 3, qpCur, alphaOff, betaOff)
          k += 4
        }
        chromaEdge(cb, cs, mbX * 8, mbY * 8 + 4, vertical = false, bS = 3, cQp(qpCur), alphaOff, betaOff)
        chromaEdge(cr, cs, mbX * 8, mbY * 8 + 4, vertical = false, bS = 3, cQp(qpCur), alphaOff, betaOff)

        mbX += 1
      }
      mbY += 1
    }
  }

  /** One luma edge: 16 lines of p3..p0 | q0..q3 across the edge at
    * (x0,y0). For a vertical edge the lines run down the edge; samples
    * step horizontally.
    */
  private def lumaEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      vertical: Boolean, bS: Int, qp: Int, aOff: Int, bOff: Int): Unit = {
    val indexA = clip3(0, 51, qp + aOff)
    val alpha = Alpha(indexA)
    val beta = Beta(clip3(0, 51, qp + bOff))
    if (alpha == 0 || beta == 0) return
    val step = if (vertical) 1 else stride // across the edge
    val line = if (vertical) stride else 1 // along the edge
    var i = 0
    while (i < 16) {
      val q0p = (y0 * stride + x0) + i * line
      filterLineLuma(plane, q0p, step, bS, alpha, beta, indexA)
      i += 1
    }
  }

  private def chromaEdge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      vertical: Boolean, bS: Int, qp: Int, aOff: Int, bOff: Int): Unit = {
    val indexA = clip3(0, 51, qp + aOff)
    val alpha = Alpha(indexA)
    val beta = Beta(clip3(0, 51, qp + bOff))
    if (alpha == 0 || beta == 0) return
    val step = if (vertical) 1 else stride
    val line = if (vertical) stride else 1
    var i = 0
    while (i < 8) {
      val q0p = (y0 * stride + x0) + i * line
      filterLineChroma(plane, q0p, step, bS, alpha, beta, indexA)
      i += 1
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
