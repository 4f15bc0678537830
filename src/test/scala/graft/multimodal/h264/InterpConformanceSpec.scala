package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

/** Independent re-derivation of the §8.4.2.2 fractional-sample
  * interpolation and the §8.4.1.3 MV-prediction cases. [[Interp]] and
  * [[MvPred]] are shared verbatim by encoder and decoder, so the
  * round-trip specs cannot catch a transcription slip in them — these
  * checks evaluate the normative equations in a structurally different
  * way (direct convolution tables, no lazy half-sample reuse) over
  * random planes and positions.
  */
class InterpConformanceSpec extends AnyFunSuite {

  // direct §8.4.2.2.1 evaluator: full-precision taps, Table 8-12 averages
  private def lumaDirect(ref: Array[Int], w: Int, h: Int,
      qx: Int, qy: Int): Int = {
    def p(x: Int, y: Int): Int =
      ref(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
    def tap(v: IndexedSeq[Int]): Int =
      v(0) - 5 * v(1) + 20 * v(2) + 20 * v(3) - 5 * v(4) + v(5)
    val x = qx >> 2; val y = qy >> 2
    val (fx, fy) = (qx & 3, qy & 3)
    def clip(v: Int) = math.max(0, math.min(255, v))
    // rounded half samples
    def halfH(cx: Int, cy: Int): Int = // 'b' at integer row cy
      clip((tap((-2 to 3).map(i => p(cx + i, cy))) + 16) >> 5)
    def halfV(cx: Int, cy: Int): Int = // 'h' at integer col cx
      clip((tap((-2 to 3).map(j => p(cx, cy + j))) + 16) >> 5)
    def centerJ(cx: Int, cy: Int): Int = { // 2-D: vertical over UNROUNDED horizontals
      val rows = (-2 to 3).map(j => tap((-2 to 3).map(i => p(cx + i, cy + j))))
      clip((tap(rows) + 512) >> 10)
    }
    (fx, fy) match {
      case (0, 0) => p(x, y)
      case (1, 0) => (p(x, y) + halfH(x, y) + 1) >> 1 // a
      case (2, 0) => halfH(x, y) // b
      case (3, 0) => (p(x + 1, y) + halfH(x, y) + 1) >> 1 // c
      case (0, 1) => (p(x, y) + halfV(x, y) + 1) >> 1 // d
      case (0, 2) => halfV(x, y) // h
      case (0, 3) => (p(x, y + 1) + halfV(x, y) + 1) >> 1 // n
      case (1, 1) => (halfH(x, y) + halfV(x, y) + 1) >> 1 // e
      case (3, 1) => (halfH(x, y) + halfV(x + 1, y) + 1) >> 1 // g
      case (1, 3) => (halfV(x, y) + halfH(x, y + 1) + 1) >> 1 // p
      case (3, 3) => (halfV(x + 1, y) + halfH(x, y + 1) + 1) >> 1 // r
      case (2, 2) => centerJ(x, y) // j
      case (2, 1) => (halfH(x, y) + centerJ(x, y) + 1) >> 1 // f
      case (2, 3) => (halfH(x, y + 1) + centerJ(x, y) + 1) >> 1 // q
      case (1, 2) => (halfV(x, y) + centerJ(x, y) + 1) >> 1 // i
      case (3, 2) => (halfV(x + 1, y) + centerJ(x, y) + 1) >> 1 // k
      case _ => fail("unreachable")
    }
  }

  test("luma quarter-pel: Interp equals the direct §8.4.2.2.1 equations") {
    val rnd = new scala.util.Random(41)
    val w = 24; val h = 20
    val ref = Array.fill(w * h)(rnd.nextInt(256))
    // every sub-pel phase, positions inside AND beyond the edges
    for {
      fy <- 0 to 3; fx <- 0 to 3
      (bx, by) <- Seq((5, 4), (0, 0), (-3, 2), (21, 17), (30, -4), (2, 25))
    } {
      val qx = 4 * bx + fx
      val qy = 4 * by + fy
      val got = Interp.lumaBlock(ref, w, h, qx, qy, 4, 4)
      for (j <- 0 until 4; i <- 0 until 4) {
        val want = lumaDirect(ref, w, h, qx + 4 * i, qy + 4 * j)
        assert(got(j * 4 + i) == want,
          s"phase ($fx,$fy) at ($bx,$by) sample ($i,$j)")
      }
    }
  }

  test("chroma eighth-pel: Interp equals the direct §8.4.2.2.2 bilinear") {
    val rnd = new scala.util.Random(43)
    val w = 12; val h = 10
    val ref = Array.fill(w * h)(rnd.nextInt(256))
    def p(x: Int, y: Int): Int =
      ref(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
    for (ey <- -9 to 85; ex <- -9 to 101 by 7) {
      val got = Interp.chromaBlock(ref, w, h, ex, ey, 2, 2)
      for (j <- 0 until 2; i <- 0 until 2) {
        val cx = (ex >> 3) + i; val cy = (ey >> 3) + j
        val dx = ex & 7; val dy = ey & 7
        val want = ((8 - dx) * (8 - dy) * p(cx, cy) + dx * (8 - dy) * p(cx + 1, cy) +
          (8 - dx) * dy * p(cx, cy + 1) + dx * dy * p(cx + 1, cy + 1) + 32) >> 6
        assert(got(j * 2 + i) == want, s"eighth-pel ($ex,$ey) sample ($i,$j)")
      }
    }
  }

  test("MV prediction pins the §8.4.1.3 selection cases") {
    def neigh(m: Map[(Int, Int), (Int, Int, Int)]): MvPred.Neigh =
      (bx, by) => m.get((bx, by))
    val at = (4, 4) // current partition top-left block
    val (bx, by) = at
    // 1. plain component-wise median of A, B, C
    val median = neigh(Map(
      (bx - 1, by) -> (0, 10, 2), (bx, by - 1) -> (0, 4, 8),
      (bx + 4, by - 1) -> (0, 6, -2)))
    assert(MvPred.predict(median, bx, by, 4, 0) == ((6, 2)))
    // 2. exactly one neighbor shares the reference → copy it, no median
    val single = neigh(Map(
      (bx - 1, by) -> (1, 10, 2), (bx, by - 1) -> (0, 4, 8),
      (bx + 4, by - 1) -> (1, 6, -2)))
    assert(MvPred.predict(single, bx, by, 4, 0) == ((4, 8)))
    // 3. B and C unavailable, A available → A regardless of reference
    val aOnly = neigh(Map((bx - 1, by) -> (2, -6, 7)))
    assert(MvPred.predict(aOnly, bx, by, 4, 0) == ((-6, 7)))
    // 4. C unavailable → D substitutes into the median
    val dSub = neigh(Map(
      (bx - 1, by) -> (0, 10, 0), (bx, by - 1) -> (0, 4, 4),
      (bx - 1, by - 1) -> (0, 7, 9)))
    assert(MvPred.predict(dSub, bx, by, 4, 0) == ((7, 4)))
    // 5. directional 16x8/8x16: the preferred neighbor wins when it
    // shares the reference, else the median path runs
    val dir = neigh(Map(
      (bx - 1, by) -> (0, 1, 1), (bx, by - 1) -> (0, 2, 2),
      (bx + 4, by - 1) -> (0, 3, 3)))
    assert(MvPred.predict(dir, bx, by, 4, 0, 'T') == ((2, 2))) // top 16x8 → B
    assert(MvPred.predict(dir, bx, by, 4, 0, 'B') == ((1, 1))) // bottom → A
    assert(MvPred.predict(dir, bx, by, 4, 0, 'L') == ((1, 1))) // left 8x16 → A
    assert(MvPred.predict(dir, bx, by, 4, 0, 'R') == ((3, 3))) // right → C
    val dirMiss = neigh(Map(
      (bx - 1, by) -> (1, 1, 1), (bx, by - 1) -> (0, 2, 2),
      (bx + 4, by - 1) -> (0, 3, 3)))
    assert(MvPred.predict(dirMiss, bx, by, 4, 0, 'B') == ((2, 2)),
      "wrong-ref directional preference falls back to the median path")
    // 6. P_Skip: unavailable A or B → zero; zero-MV ref-0 neighbor → zero
    assert(MvPred.skipMv(neigh(Map((bx, by - 1) -> (0, 5, 5))), bx, by) == ((0, 0)))
    assert(MvPred.skipMv(neigh(Map(
      (bx - 1, by) -> (0, 0, 0), (bx, by - 1) -> (0, 5, 5))), bx, by) == ((0, 0)))
    assert(MvPred.skipMv(neigh(Map(
      (bx - 1, by) -> (0, 3, 1), (bx, by - 1) -> (0, 5, 5),
      (bx + 4, by - 1) -> (0, 4, 2))), bx, by) == ((4, 2)))
  }
}
