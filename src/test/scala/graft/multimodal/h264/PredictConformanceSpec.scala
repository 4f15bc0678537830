package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

/** Independent re-derivation of §8.3 intra prediction. [[Predict]] is
  * shared by encoder and decoder, so round-trips cannot catch a
  * transcription slip — this evaluator expresses every mode through a
  * single virtual-neighbor accessor p[x,y] (p[−1,−1] = corner,
  * p[x,−1] = above row, p[−1,y] = left column), the way the standard
  * writes the equations, and compares against the mode kernels over
  * random neighbor content.
  */
class PredictConformanceSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(67)

  private def direct4x4(mode: Int, u: Array[Int], l: Array[Int], c: Int,
      aU: Boolean, aL: Boolean): Array[Int] = {
    def p(x: Int, y: Int): Int =
      if (x == -1 && y == -1) c
      else if (y == -1) u(x)
      else l(y)
    val out = new Array[Int](16)
    def set(x: Int, y: Int, v: Int): Unit = out(y * 4 + x) = v
    for (y <- 0 until 4; x <- 0 until 4) mode match {
      case 0 => set(x, y, p(x, -1))
      case 1 => set(x, y, p(-1, y))
      case 2 =>
        val v =
          if (aU && aL) ((0 to 3).map(p(_, -1)).sum + (0 to 3).map(p(-1, _)).sum + 4) >> 3
          else if (aU) ((0 to 3).map(p(_, -1)).sum + 2) >> 2
          else if (aL) ((0 to 3).map(p(-1, _)).sum + 2) >> 2
          else 128
        set(x, y, v)
      case 3 =>
        set(x, y, if (x == 3 && y == 3) (p(6, -1) + 3 * p(7, -1) + 2) >> 2
        else (p(x + y, -1) + 2 * p(x + y + 1, -1) + p(x + y + 2, -1) + 2) >> 2)
      case 4 =>
        set(x, y,
          if (x > y) (p(x - y - 2, -1) + 2 * p(x - y - 1, -1) + p(x - y, -1) + 2) >> 2
          else if (x < y) (p(-1, y - x - 2) + 2 * p(-1, y - x - 1) + p(-1, y - x) + 2) >> 2
          else (p(0, -1) + 2 * p(-1, -1) + p(-1, 0) + 2) >> 2)
      case 5 =>
        val z = 2 * x - y
        set(x, y,
          if (z >= 0 && z % 2 == 0)
            (p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 1) >> 1
          else if (z >= 1)
            (p(x - (y >> 1) - 2, -1) + 2 * p(x - (y >> 1) - 1, -1) +
              p(x - (y >> 1), -1) + 2) >> 2
          else if (z == -1) (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          else (p(-1, y - 2 * x - 1) + 2 * p(-1, y - 2 * x - 2) +
            p(-1, y - 2 * x - 3) + 2) >> 2)
      case 6 =>
        val z = 2 * y - x
        set(x, y,
          if (z >= 0 && z % 2 == 0)
            (p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 1) >> 1
          else if (z >= 1)
            (p(-1, y - (x >> 1) - 2) + 2 * p(-1, y - (x >> 1) - 1) +
              p(-1, y - (x >> 1)) + 2) >> 2
          else if (z == -1) (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          else (p(x - 2 * y - 1, -1) + 2 * p(x - 2 * y - 2, -1) +
            p(x - 2 * y - 3, -1) + 2) >> 2)
      case 7 =>
        set(x, y,
          if (y % 2 == 0) (p(x + (y >> 1), -1) + p(x + (y >> 1) + 1, -1) + 1) >> 1
          else (p(x + (y >> 1), -1) + 2 * p(x + (y >> 1) + 1, -1) +
            p(x + (y >> 1) + 2, -1) + 2) >> 2)
      case 8 =>
        val z = x + 2 * y
        set(x, y,
          if (z > 5) p(-1, 3)
          else if (z == 5) (p(-1, 2) + 3 * p(-1, 3) + 2) >> 2
          else if (z % 2 == 0) (p(-1, y + (x >> 1)) + p(-1, y + (x >> 1) + 1) + 1) >> 1
          else (p(-1, y + (x >> 1)) + 2 * p(-1, y + (x >> 1) + 1) +
            p(-1, y + (x >> 1) + 2) + 2) >> 2)
    }
    out
  }

  test("Intra_4x4: every mode equals the direct §8.3.1.2 equations") {
    for (trial <- 0 until 50; mode <- 0 to 8) {
      val u = Array.fill(8)(rnd.nextInt(256))
      val l = Array.fill(4)(rnd.nextInt(256))
      val c = rnd.nextInt(256)
      // availability per the mode's requirements (DC also over partials)
      val configs: Seq[(Boolean, Boolean)] = mode match {
        case 2 => Seq((true, true), (true, false), (false, true), (false, false))
        case 0 | 3 | 7 => Seq((true, true), (true, false))
        case 1 | 8 => Seq((true, true), (false, true))
        case _ => Seq((true, true))
      }
      configs.foreach { case (aU, aL) =>
        val got = new Array[Int](16)
        Predict.luma4x4(mode, got, 4, 0, 0, u, l, c, aU, aL)
        assert(got.toSeq == direct4x4(mode, u, l, c, aU, aL).toSeq,
          s"mode $mode aU=$aU aL=$aL trial=$trial")
      }
    }
  }

  test("Intra_16x16 plane and chroma plane equal the direct §8.3.2.4/§8.3.4.4 sums") {
    def directPlane(n: Int, u: Array[Int], l: Array[Int], c: Int,
        mult: Int, shift: Int): Array[Int] = {
      def pu(x: Int): Int = if (x == -1) c else u(x)
      def pl(y: Int): Int = if (y == -1) c else l(y)
      val half = n / 2
      val hSum = (1 to half).map(i => i * (pu(half - 1 + i) - pu(half - 1 - i))).sum
      val vSum = (1 to half).map(i => i * (pl(half - 1 + i) - pl(half - 1 - i))).sum
      val a = 16 * (pl(n - 1) + pu(n - 1))
      val b = (mult * hSum + (1 << (shift - 1))) >> shift
      val cc = (mult * vSum + (1 << (shift - 1))) >> shift
      Array.tabulate(n * n) { k =>
        val x = k % n; val y = k / n
        math.max(0, math.min(255,
          (a + b * (x - (half - 1)) + cc * (y - (half - 1)) + 16) >> 5))
      }
    }
    for (trial <- 0 until 50) {
      val u16 = Array.fill(16)(rnd.nextInt(256))
      val l16 = Array.fill(16)(rnd.nextInt(256))
      val c = rnd.nextInt(256)
      val got16 = new Array[Int](256)
      Predict.luma16x16(3, got16, 16, 0, 0, u16, l16, c, availU = true, availL = true)
      assert(got16.toSeq == directPlane(16, u16, l16, c, 5, 6).toSeq, s"16x16 plane $trial")
      val u8 = Array.fill(8)(rnd.nextInt(256))
      val l8 = Array.fill(8)(rnd.nextInt(256))
      val got8 = new Array[Int](64)
      Predict.chroma8x8(3, got8, 8, 0, 0, u8, l8, c, availU = true, availL = true)
      assert(got8.toSeq == directPlane(8, u8, l8, c, 17, 5).toSeq, s"chroma plane $trial")
    }
  }

  test("chroma DC quadrants pin the §8.3.4.1 edge preferences") {
    val u = Array.tabulate(8)(i => 8 * i) // distinct quadrant sums
    val l = Array.tabulate(8)(i => 200 - 8 * i)
    val got = new Array[Int](64)
    Predict.chroma8x8(0, got, 8, 0, 0, u, l, 99, availU = true, availL = true)
    def s4(a: Array[Int], o: Int) = a(o) + a(o + 1) + a(o + 2) + a(o + 3)
    assert(got(0) == (s4(u, 0) + s4(l, 0) + 4) >> 3, "top-left: both edges")
    assert(got(7) == (s4(u, 4) + 2) >> 2, "top-right: above only")
    assert(got(7 * 8) == (s4(l, 4) + 2) >> 2, "bottom-left: left only")
    assert(got(63) == (s4(u, 4) + s4(l, 4) + 4) >> 3, "bottom-right: both")
    // unavailable edges fall back per §8.3.4.1
    val noU = new Array[Int](64)
    Predict.chroma8x8(0, noU, 8, 0, 0, u, l, 99, availU = false, availL = true)
    assert(noU(7) == (s4(l, 0) + 2) >> 2, "top-right falls back to left")
    val none = new Array[Int](64)
    Predict.chroma8x8(0, none, 8, 0, 0, u, l, 99, availU = false, availL = false)
    assert(none.forall(_ == 128))
  }
}
