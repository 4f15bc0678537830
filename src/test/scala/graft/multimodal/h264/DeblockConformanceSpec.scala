package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

/** Independent re-derivation of the §8.7.2.3/.4 edge filters. The
  * deblocker is shared by encoder and decoder, so round-trips cannot
  * catch a transcription slip — here one vertical MB edge is isolated
  * (the bS callback gates every other edge off) and the filtered
  * samples are recomputed directly from the normative equations for
  * every strength and a spread of QPs.
  */
class DeblockConformanceSpec extends AnyFunSuite {

  // Table 8-16/8-17 reproduced independently (printed spec values)
  private val Alpha = Array.fill(16)(0) ++ Array(
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255)
  private val Beta = Array.fill(16)(0) ++ Array(
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18)
  private val Tc0 = Array(
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13),
    Array.fill(16)(0) ++ Array(0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
      2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17),
    Array.fill(16)(0) ++ Array(0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
      3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25))

  private def clip3(lo: Int, hi: Int, v: Int) = math.max(lo, math.min(hi, v))
  private def clip1(v: Int) = math.max(0, math.min(255, v))

  /** One luma line through the §8.7.2.3/.4 equations, written directly. */
  private def lumaLineDirect(s: IndexedSeq[Int], bS: Int, qp: Int): IndexedSeq[Int] = {
    val Seq(p3, p2, p1, p0, q0, q1, q2, q3) = s.toSeq
    val alpha = Alpha(qp); val beta = Beta(qp)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return s
    val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
    if (bS == 4) {
      val strongP = ap < beta && math.abs(p0 - q0) < (alpha >> 2) + 2
      val strongQ = aq < beta && math.abs(p0 - q0) < (alpha >> 2) + 2
      val np = if (strongP) IndexedSeq(
        (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
        (p2 + p1 + p0 + q0 + 2) >> 2,
        (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
      else IndexedSeq(p2, p1, (2 * p1 + p0 + q1 + 2) >> 2)
      val nq = if (strongQ) IndexedSeq(
        (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
        (q2 + q1 + q0 + p0 + 2) >> 2,
        (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
      else IndexedSeq((2 * q1 + q0 + p1 + 2) >> 2, q1, q2)
      IndexedSeq(p3, np(0), np(1), np(2), nq(0), nq(1), nq(2), q3)
    } else {
      val tc0 = Tc0(bS - 1)(qp)
      val tc = tc0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      val np1 = if (ap < beta)
        p1 + clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1) else p1
      val nq1 = if (aq < beta)
        q1 + clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1) else q1
      IndexedSeq(p3, p2, np1, clip1(p0 + delta), clip1(q0 - delta), nq1, q2, q3)
    }
  }

  /** One chroma line (p1 p0 | q0 q1) through the direct equations. */
  private def chromaLineDirect(s: IndexedSeq[Int], bS: Int, qp: Int): IndexedSeq[Int] = {
    val Seq(p1, p0, q0, q1) = s.toSeq
    val alpha = Alpha(qp); val beta = Beta(qp)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return s
    if (bS == 4) IndexedSeq(p1, (2 * p1 + p0 + q1 + 2) >> 2,
      (2 * q1 + q0 + p1 + 2) >> 2, q1)
    else {
      val tc = Tc0(bS - 1)(qp) + 1
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      IndexedSeq(p1, clip1(p0 + delta), clip1(q0 - delta), q1)
    }
  }

  test("chroma edge filtering equals the direct §8.7.2.4 equations") {
    val rnd = new scala.util.Random(53)
    val wMb = 2; val hMb = 1
    for (bS <- 1 to 4; qp <- Seq(24, 32, 40); trial <- 0 until 8) {
      val w = wMb * 16; val h = hMb * 16
      val cw = w / 2; val ch = h / 2
      val y = Array.fill(w * h)(128)
      val cbp = Array.fill(cw * ch)(rnd.nextInt(256))
      val crp = cbp.map(v => clip1(v + rnd.nextInt(9) - 4))
      for (r <- 0 until ch if r % 2 == 1) { // smooth some lines
        val base = rnd.nextInt(200) + 20
        for (x <- 6 until 10) cbp(r * cw + x) = clip1(base + rnd.nextInt(5) - 2)
      }
      val beforeCb = cbp.clone()
      val beforeCr = crp.clone()
      // chroma QP table is identity at these QPs' range? No — use the
      // real mapping: filterFrame derives chroma QP itself, so the
      // direct evaluator must use the same mapped value
      val qpc = Transform.chromaQp(qp, 0)
      Deblock.filterFrame(y, cbp, crp, wMb, hMb, Array.fill(wMb * hMb)(qp), 0,
        0, 0, (pbx, pby, qbx, qby, mbEdge) =>
          if (mbEdge && pbx == 3 && qbx == 4) bS else 0)
      for (r <- 0 until ch) {
        val wantCb = chromaLineDirect((6 until 10).map(x => beforeCb(r * cw + x)), bS, qpc)
        val gotCb = (6 until 10).map(x => cbp(r * cw + x))
        assert(gotCb == wantCb, s"cb bS=$bS qp=$qp trial=$trial row $r")
        val wantCr = chromaLineDirect((6 until 10).map(x => beforeCr(r * cw + x)), bS, qpc)
        val gotCr = (6 until 10).map(x => crp(r * cw + x))
        assert(gotCr == wantCr, s"cr bS=$bS qp=$qp trial=$trial row $r")
      }
    }
  }

  test("luma edge filtering equals the direct §8.7.2.3/.4 equations") {
    val rnd = new scala.util.Random(47)
    val wMb = 2; val hMb = 1
    for (bS <- 1 to 4; qp <- Seq(20, 28, 34, 40, 48); trial <- 0 until 12) {
      // a frame whose only filtered edge is the vertical MB edge x=16;
      // lines vary so the per-line threshold decisions all appear
      val w = wMb * 16; val h = hMb * 16
      val y = Array.fill(w * h)(rnd.nextInt(256))
      // make some lines locally smooth so the filter engages
      for (r <- 0 until h if r % 2 == 0) {
        val base = rnd.nextInt(200) + 20
        for (x <- 12 until 20) y(r * w + x) = clip1(base + rnd.nextInt(7) - 3)
      }
      val before = y.clone()
      val cbp = Array.fill(w / 2 * h / 2)(128)
      val crp = cbp.clone()
      Deblock.filterFrame(y, cbp, crp, wMb, hMb, Array.fill(wMb * hMb)(qp), 0,
        0, 0, (pbx, pby, qbx, qby, mbEdge) =>
          if (mbEdge && pbx == 3 && qbx == 4) bS else 0)
      for (r <- 0 until h) {
        val line = (12 until 20).map(x => before(r * w + x))
        val want = lumaLineDirect(line, bS, qp)
        val got = (12 until 20).map(x => y(r * w + x))
        assert(got == want, s"bS=$bS qp=$qp trial=$trial row $r: $line")
      }
    }
  }
}
