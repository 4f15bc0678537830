package graft.multimodal.h264

/** H.264 integer transforms + quantization (ITU-T H.264 §8.5, §8.6).
  *
  * The inverse side (what a decoder must implement exactly) follows the
  * normative equations: 4×4 core inverse transform (§8.5.12.2) with its
  * >>1 butterflies and final (x+32)>>6 rounding, the 4×4 luma-DC Hadamard
  * (§8.5.10) and 2×2 chroma-DC transform (§8.5.11), and the LevelScale
  * dequant with position classes {(0,0),(0,2),(2,0),(2,2)} / diag / rest.
  * The forward side (encoder-only, non-normative) uses the standard's
  * reference design: Cf core transform with MF multipliers and the
  * deadzone f = 2^qbits/3 (intra).
  */
object Transform {

  /** Zig-zag scan, frame coding (Table 8-13): scan position → raster idx. */
  val Zigzag: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // LevelScale weights V[qp%6][class] — class 0: corner positions,
  // class 1: diagonal odd positions, class 2: the rest (Table defining
  // LevelScale4x4 via the normAdjust m=qP%6 rows).
  private val V: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  // Forward multipliers MF[qp%6][class] (reference-encoder design).
  private val MF: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))

  /** Position class of raster index 0..15 in a 4×4 block. */
  private def posClass(idx: Int): Int = {
    val r = idx >> 2; val c = idx & 3
    if ((r == 0 || r == 2) && (c == 0 || c == 2)) 0
    else if ((r == 1 || r == 3) && (c == 1 || c == 3)) 1
    else 2
  }

  private val PosClass: Array[Int] = Array.tabulate(16)(posClass)

  /** Chroma QP from luma QP + offset (Table 8-15). */
  def chromaQp(qpY: Int, offset: Int): Int = {
    val qPi = math.max(0, math.min(51, qpY + offset))
    if (qPi < 30) qPi
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)(qPi - 30)
  }

  /** Dequantize a 4×4 residual block of quantized levels (raster order)
    * in place-free style: returns scaled coefficients ready for
    * [[inverse4x4]]. For Intra_16x16 luma and chroma AC blocks the DC
    * position is carried in from its own transform and must be placed by
    * the caller AFTER this (pass `skipDc = true`).
    */
  def dequant4x4(levels: Array[Int], qp: Int, skipDc: Boolean): Array[Int] = {
    val m = qp % 6
    val shift = qp / 6
    val out = new Array[Int](16)
    var i = if (skipDc) 1 else 0
    while (i < 16) {
      out(i) = (levels(i) * V(m)(PosClass(i))) << shift
      i += 1
    }
    out
  }

  /** Normative inverse 4×4 core transform (§8.5.12.2) + (x+32)>>6.
    * Input scaled coefficients (raster), output residual (raster).
    */
  def inverse4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    // horizontal (row) transform
    var r = 0
    while (r < 4) {
      val o = r * 4
      val a0 = d(o) + d(o + 2)
      val a1 = d(o) - d(o + 2)
      val a2 = (d(o + 1) >> 1) - d(o + 3)
      val a3 = d(o + 1) + (d(o + 3) >> 1)
      e(o) = a0 + a3; e(o + 1) = a1 + a2; e(o + 2) = a1 - a2; e(o + 3) = a0 - a3
      r += 1
    }
    val out = new Array[Int](16)
    // vertical (column) transform
    var c = 0
    while (c < 4) {
      val a0 = e(c) + e(8 + c)
      val a1 = e(c) - e(8 + c)
      val a2 = (e(4 + c) >> 1) - e(12 + c)
      val a3 = e(4 + c) + (e(12 + c) >> 1)
      out(c) = (a0 + a3 + 32) >> 6
      out(4 + c) = (a1 + a2 + 32) >> 6
      out(8 + c) = (a1 - a2 + 32) >> 6
      out(12 + c) = (a0 - a3 + 32) >> 6
      c += 1
    }
    out
  }

  /** 4×4 Hadamard (self-inverse up to scale) for the Intra_16x16 luma DC
    * path — used both directions (§8.5.10 inverse; forward in the
    * reference encoder divides by 2 after).
    */
  def hadamard4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var r = 0
    while (r < 4) {
      val o = r * 4
      val a0 = d(o) + d(o + 2); val a1 = d(o) - d(o + 2)
      val a2 = d(o + 1) - d(o + 3); val a3 = d(o + 1) + d(o + 3)
      e(o) = a0 + a3; e(o + 1) = a1 + a2; e(o + 2) = a1 - a2; e(o + 3) = a0 - a3
      r += 1
    }
    val out = new Array[Int](16)
    var c = 0
    while (c < 4) {
      val a0 = e(c) + e(8 + c); val a1 = e(c) - e(8 + c)
      val a2 = e(4 + c) - e(12 + c); val a3 = e(4 + c) + e(12 + c)
      out(c) = a0 + a3; out(4 + c) = a1 + a2
      out(8 + c) = a1 - a2; out(12 + c) = a0 - a3
      c += 1
    }
    out
  }

  /** Inverse luma DC scaling (§8.5.10 eq. 8-256): Hadamard then scale.
    * LevelScale4x4 is weightScale·normAdjust = 16·V for the flat default
    * scaling list — the ×16 must be included or the DC path comes out
    * 16× too small relative to the AC path.
    */
  def dequantLumaDc(levels: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard4x4(levels)
    val scale = V(qp % 6)(0) * 16
    val out = new Array[Int](16)
    var i = 0
    while (i < 16) {
      out(i) =
        if (qp >= 36) (f(i) * scale) << (qp / 6 - 6)
        else (f(i) * scale + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      i += 1
    }
    out
  }

  /** 2×2 chroma DC transform (§8.5.11) — self-structured butterfly. */
  def chromaDcTransform(d: Array[Int]): Array[Int] = Array(
    d(0) + d(1) + d(2) + d(3), d(0) - d(1) + d(2) - d(3),
    d(0) + d(1) - d(2) - d(3), d(0) - d(1) - d(2) + d(3))

  /** Inverse chroma DC scaling (§8.5.11 eq. 8-258; LevelScale = 16·V as
    * for the luma DC).
    */
  def dequantChromaDc(levels: Array[Int], qpC: Int): Array[Int] = {
    val f = chromaDcTransform(levels)
    val scale = V(qpC % 6)(0) * 16
    f.map(v => ((v * scale) << (qpC / 6)) >> 5)
  }

  // ------------------------------------------------------------ forward
  // (encoder-only; the standard does not normatively constrain these)

  /** Forward 4×4 core transform Cf·X·CfT (raster in/out). */
  def forward4x4(x: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var r = 0
    while (r < 4) {
      val o = r * 4
      val s0 = x(o) + x(o + 3); val s1 = x(o + 1) + x(o + 2)
      val d0 = x(o) - x(o + 3); val d1 = x(o + 1) - x(o + 2)
      e(o) = s0 + s1; e(o + 1) = 2 * d0 + d1
      e(o + 2) = s0 - s1; e(o + 3) = d0 - 2 * d1
      r += 1
    }
    val out = new Array[Int](16)
    var c = 0
    while (c < 4) {
      val s0 = e(c) + e(12 + c); val s1 = e(4 + c) + e(8 + c)
      val d0 = e(c) - e(12 + c); val d1 = e(4 + c) - e(8 + c)
      out(c) = s0 + s1; out(4 + c) = 2 * d0 + d1
      out(8 + c) = s0 - s1; out(12 + c) = d0 - 2 * d1
      c += 1
    }
    out
  }

  /** Quantize transformed coefficients (raster) at `qp`; intra deadzone. */
  def quant4x4(w: Array[Int], qp: Int, skipDc: Boolean): Array[Int] = {
    val m = qp % 6
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val out = new Array[Int](16)
    var i = if (skipDc) 1 else 0
    while (i < 16) {
      val mf = MF(m)(PosClass(i))
      val z = (math.abs(w(i)) * mf + f) >> qbits
      out(i) = if (w(i) < 0) -z else z
      i += 1
    }
    out
  }

  /** Forward luma DC: Hadamard of the 16 block DCs, /2, then quantize
    * with the (0,0) multiplier at doubled deadzone/shift (reference
    * design, mirrors the inverse's extra scale headroom).
    */
  def quantLumaDc(dc: Array[Int], qp: Int): Array[Int] = {
    val h = hadamard4x4(dc).map(v => (if (v >= 0) v + 1 else v - 1) / 2)
    val mf = MF(qp % 6)(0)
    val qbits = 16 + qp / 6
    val f = (1 << qbits) / 3
    h.map { v =>
      val z = (math.abs(v) * mf + f) >> qbits
      if (v < 0) -z else z
    }
  }

  /** Forward chroma DC: 2×2 butterfly then quantize at doubled shift. */
  def quantChromaDc(dc: Array[Int], qpC: Int): Array[Int] = {
    val h = chromaDcTransform(dc)
    val mf = MF(qpC % 6)(0)
    val qbits = 16 + qpC / 6
    val f = (1 << qbits) / 3
    h.map { v =>
      val z = (math.abs(v) * mf + f) >> qbits
      if (v < 0) -z else z
    }
  }

  def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
}
