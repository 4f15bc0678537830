package graft.multimodal.h264

/** Intra prediction (ITU-T H.264 §8.3). All kernels write into a plane
  * (`dst` with `stride`) at (x0, y0) and read gathered neighbor arrays:
  * `u` = p[0..,-1] (above), `l` = p[-1,0..] (left), `c` = p[-1,-1].
  * Callers gather neighbors from RECONSTRUCTED (pre-deblocking) samples
  * and apply the §8.3.1.2 up-right substitution (p[x,-1]:=p[N-1,-1] when
  * above-right is unavailable) before invoking mode kernels.
  */
object Predict {

  @inline private def clip(v: Int): Int = Transform.clip255(v)

  /** Luma 4×4, modes 0..8 (§8.3.1.2.1-9). `u` has 8 entries (up +
    * up-right, already substituted), `l` 4, `c` the corner.
    */
  def luma4x4(mode: Int, dst: Array[Int], stride: Int, x0: Int, y0: Int,
      u: Array[Int], l: Array[Int], c: Int,
      availU: Boolean, availL: Boolean): Unit = {
    def set(x: Int, y: Int, v: Int): Unit = dst((y0 + y) * stride + x0 + x) = v
    mode match {
      case 0 => // Vertical
        require(availU, "Intra_4x4_Vertical without above neighbor")
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, u(x))
      case 1 => // Horizontal
        require(availL, "Intra_4x4_Horizontal without left neighbor")
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, l(y))
      case 2 => // DC
        val v =
          if (availU && availL) (u(0) + u(1) + u(2) + u(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (availU) (u(0) + u(1) + u(2) + u(3) + 2) >> 2
          else if (availL) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, v)
      case 3 => // Diagonal-Down-Left
        require(availU, "Intra_4x4_DDL without above neighbor")
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x == 3 && y == 3) (u(6) + 3 * u(7) + 2) >> 2
            else (u(x + y) + 2 * u(x + y + 1) + u(x + y + 2) + 2) >> 2)
      case 4 => // Diagonal-Down-Right
        require(availU && availL, "Intra_4x4_DDR without both neighbors")
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x > y) ((if (x - y - 2 < 0) c else u(x - y - 2)) +
              2 * u(x - y - 1) + u(x - y) + 2) >> 2
            else if (x < y) ((if (y - x - 2 < 0) c else l(y - x - 2)) +
              2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (u(0) + 2 * c + l(0) + 2) >> 2)
      case 5 => // Vertical-Right
        require(availU && availL, "Intra_4x4_VR without both neighbors")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zVR = 2 * x - y
          val v =
            if (zVR >= 0 && zVR % 2 == 0) {
              val i = x - (y >> 1)
              ((if (i == 0) c else u(i - 1)) + u(i) + 1) >> 1
            } else if (zVR >= 1) {
              val i = x - (y >> 1)
              ((if (i == 1) c else u(i - 2)) + 2 * u(i - 1) + u(i) + 2) >> 2
            } else if (zVR == -1) (l(0) + 2 * c + u(0) + 2) >> 2
            else (l(y - 2 * x - 1) + 2 * l(y - 2 * x - 2) +
              (if (y - 2 * x - 3 < 0) c else l(y - 2 * x - 3)) + 2) >> 2
          set(x, y, v)
        }
      case 6 => // Horizontal-Down
        require(availU && availL, "Intra_4x4_HD without both neighbors")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHD = 2 * y - x
          val v =
            if (zHD >= 0 && zHD % 2 == 0) {
              val i = y - (x >> 1)
              ((if (i == 0) c else l(i - 1)) + l(i) + 1) >> 1
            } else if (zHD >= 1) {
              val i = y - (x >> 1)
              ((if (i == 1) c else l(i - 2)) + 2 * l(i - 1) + l(i) + 2) >> 2
            } else if (zHD == -1) (l(0) + 2 * c + u(0) + 2) >> 2
            else (u(x - 2 * y - 1) + 2 * u(x - 2 * y - 2) +
              (if (x - 2 * y - 3 < 0) c else u(x - 2 * y - 3)) + 2) >> 2
          set(x, y, v)
        }
      case 7 => // Vertical-Left
        require(availU, "Intra_4x4_VL without above neighbor")
        for (y <- 0 until 4; x <- 0 until 4) {
          val i = x + (y >> 1)
          val v =
            if (y % 2 == 0) (u(i) + u(i + 1) + 1) >> 1
            else (u(i) + 2 * u(i + 1) + u(i + 2) + 2) >> 2
          set(x, y, v)
        }
      case 8 => // Horizontal-Up
        require(availL, "Intra_4x4_HU without left neighbor")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHU = x + 2 * y
          val v =
            if (zHU > 5) l(3)
            else if (zHU == 5) (l(2) + 3 * l(3) + 2) >> 2
            else if (zHU % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
          set(x, y, v)
        }
      case m => throw new IllegalArgumentException(s"intra 4x4 mode $m")
    }
  }

  /** Luma 16×16, modes 0=V 1=H 2=DC 3=Plane (§8.3.2). `u`/`l` hold 16. */
  def luma16x16(mode: Int, dst: Array[Int], stride: Int, x0: Int, y0: Int,
      u: Array[Int], l: Array[Int], c: Int,
      availU: Boolean, availL: Boolean): Unit =
    blockPred(mode, 16, dst, stride, x0, y0, u, l, c, availU, availL,
      dcShiftBoth = 5, planeBC = 5)

  /** Chroma 8×8, modes 0=DC 1=H 2=V 3=Plane (§8.3.4) — NOTE the mode
    * numbering differs from luma, and DC predicts each 4×4 quadrant from
    * its preferred edge.
    */
  def chroma8x8(mode: Int, dst: Array[Int], stride: Int, x0: Int, y0: Int,
      u: Array[Int], l: Array[Int], c: Int,
      availU: Boolean, availL: Boolean): Unit = {
    def set(x: Int, y: Int, v: Int): Unit = dst((y0 + y) * stride + x0 + x) = v
    mode match {
      case 0 => // DC per 4x4 quadrant
        def sum4(a: Array[Int], from: Int) = a(from) + a(from + 1) + a(from + 2) + a(from + 3)
        for (qy <- 0 to 1; qx <- 0 to 1) {
          val preferU = (qx == 1 && qy == 0)
          val preferL = (qx == 0 && qy == 1)
          val v =
            if (preferU) {
              if (availU) (sum4(u, 4) + 2) >> 2
              else if (availL) (sum4(l, 0) + 2) >> 2
              else 128
            } else if (preferL) {
              if (availL) (sum4(l, 4) + 2) >> 2
              else if (availU) (sum4(u, 0) + 2) >> 2
              else 128
            } else {
              val uo = qx * 4; val lo = qy * 4
              if (availU && availL) (sum4(u, uo) + sum4(l, lo) + 4) >> 3
              else if (availU) (sum4(u, uo) + 2) >> 2
              else if (availL) (sum4(l, lo) + 2) >> 2
              else 128
            }
          for (y <- 0 until 4; x <- 0 until 4) set(qx * 4 + x, qy * 4 + y, v)
        }
      case 1 => // Horizontal
        require(availL, "Intra_Chroma_Horizontal without left neighbor")
        for (y <- 0 until 8; x <- 0 until 8) set(x, y, l(y))
      case 2 => // Vertical
        require(availU, "Intra_Chroma_Vertical without above neighbor")
        for (y <- 0 until 8; x <- 0 until 8) set(x, y, u(x))
      case 3 =>
        planePred(8, dst, stride, x0, y0, u, l, c, bcShift = 5, mult = 17)
      case m => throw new IllegalArgumentException(s"intra chroma mode $m")
    }
  }

  /** Shared V/H/DC/Plane for the square 16×16 path. */
  private def blockPred(mode: Int, n: Int, dst: Array[Int], stride: Int,
      x0: Int, y0: Int, u: Array[Int], l: Array[Int], c: Int,
      availU: Boolean, availL: Boolean, dcShiftBoth: Int, planeBC: Int): Unit = {
    def set(x: Int, y: Int, v: Int): Unit = dst((y0 + y) * stride + x0 + x) = v
    mode match {
      case 0 =>
        require(availU, "Intra_16x16_Vertical without above neighbor")
        for (y <- 0 until n; x <- 0 until n) set(x, y, u(x))
      case 1 =>
        require(availL, "Intra_16x16_Horizontal without left neighbor")
        for (y <- 0 until n; x <- 0 until n) set(x, y, l(y))
      case 2 =>
        val v =
          if (availU && availL) (u.take(n).sum + l.take(n).sum + n) >> dcShiftBoth
          else if (availU) (u.take(n).sum + n / 2) >> (dcShiftBoth - 1)
          else if (availL) (l.take(n).sum + n / 2) >> (dcShiftBoth - 1)
          else 128
        for (y <- 0 until n; x <- 0 until n) set(x, y, v)
      case 3 =>
        planePred(n, dst, stride, x0, y0, u, l, c, bcShift = 6, mult = 5)
      case m => throw new IllegalArgumentException(s"intra 16x16 mode $m")
    }
  }

  /** Plane prediction (§8.3.2.4 / §8.3.4.4): n=16 mult=5 shift=6, or
    * n=8 mult=17 shift=5.
    */
  private def planePred(n: Int, dst: Array[Int], stride: Int, x0: Int, y0: Int,
      u: Array[Int], l: Array[Int], c: Int, bcShift: Int, mult: Int): Unit = {
    val half = n / 2
    var hSum = 0; var vSum = 0
    var i = 0
    while (i < half) {
      val uLo = if (half - 2 - i < 0) c else u(half - 2 - i)
      val lLo = if (half - 2 - i < 0) c else l(half - 2 - i)
      hSum += (i + 1) * (u(half + i) - uLo)
      vSum += (i + 1) * (l(half + i) - lLo)
      i += 1
    }
    val a = 16 * (l(n - 1) + u(n - 1))
    val b = (mult * hSum + (1 << (bcShift - 1))) >> bcShift
    val cc = (mult * vSum + (1 << (bcShift - 1))) >> bcShift
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        dst((y0 + y) * stride + x0 + x) =
          clip((a + b * (x - (half - 1)) + cc * (y - (half - 1)) + 16) >> 5)
        x += 1
      }
      y += 1
    }
  }
}
