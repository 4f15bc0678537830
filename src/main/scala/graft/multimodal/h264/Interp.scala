package graft.multimodal.h264

/** Fractional-sample interpolation for inter prediction (ITU-T H.264
  * §8.4.2.2): luma quarter-sample via the 6-tap (1,−5,20,20,−5,1)
  * half-sample filter + bilinear quarter averaging, chroma eighth-sample
  * bilinear. Out-of-picture reads clamp to the edge (the normative
  * reference-picture padding).
  */
object Interp {

  @inline private def clip(v: Int): Int = Transform.clip255(v)

  /** Fetch one luma prediction block of (bw × bh) from `ref` at
    * quarter-pel position (qx, qy) — qx = 4·x0 + mvx with mvx in
    * quarter-pel units. Output row-major bw×bh.
    */
  def lumaBlock(ref: Array[Int], w: Int, h: Int,
      qx: Int, qy: Int, bw: Int, bh: Int): Array[Int] =
    lumaBlockInto(new Array[Int](bw * bh), ref, w, h, qx, qy, bw, bh)

  /** Same, writing into a caller-provided buffer (motion search runs
    * dozens of SAD probes per partition — reusing one scratch keeps the
    * encoder's hottest loop allocation-free).
    */
  def lumaBlockInto(out: Array[Int], ref: Array[Int], w: Int, h: Int,
      qx: Int, qy: Int, bw: Int, bh: Int): Array[Int] = {
    val xInt = qx >> 2
    val yInt = qy >> 2
    val xF = qx & 3
    val yF = qy & 3

    @inline def p(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      ref(cy * w + cx)
    }
    // 6-tap horizontal at integer row, un-normalized
    @inline def hTap(x: Int, y: Int): Int =
      p(x - 2, y) - 5 * p(x - 1, y) + 20 * p(x, y) + 20 * p(x + 1, y) -
        5 * p(x + 2, y) + p(x + 3, y)
    // 6-tap vertical at integer column, un-normalized
    @inline def vTap(x: Int, y: Int): Int =
      p(x, y - 2) - 5 * p(x, y - 1) + 20 * p(x, y) + 20 * p(x, y + 1) -
        5 * p(x, y + 2) + p(x, y + 3)

    var j = 0
    while (j < bh) {
      var i = 0
      while (i < bw) {
        val x = xInt + i
        val y = yInt + j
        val G = p(x, y)
        val v: Int =
          if (xF == 0 && yF == 0) G
          else {
            // the three half-sample values around G (§8.4.2.2.1 names)
            lazy val b = clip((hTap(x, y) + 16) >> 5) // half right
            lazy val hh = clip((vTap(x, y) + 16) >> 5) // half down
            lazy val j2 = { // center half (2-D 6-tap)
              val cc = vTap(x - 2, y) - 5 * vTap(x - 1, y) + 20 * vTap(x, y) +
                20 * vTap(x + 1, y) - 5 * vTap(x + 2, y) + vTap(x + 3, y)
              clip((cc + 512) >> 10)
            }
            lazy val H = p(x + 1, y)
            lazy val M = p(x, y + 1)
            lazy val bDown = clip((hTap(x, y + 1) + 16) >> 5) // 's' in the spec
            lazy val hRight = clip((vTap(x + 1, y) + 16) >> 5) // 'm'
            (xF, yF) match {
              case (1, 0) => (G + b + 1) >> 1 // a
              case (2, 0) => b
              case (3, 0) => (H + b + 1) >> 1 // c
              case (0, 1) => (G + hh + 1) >> 1 // d
              case (0, 2) => hh
              case (0, 3) => (M + hh + 1) >> 1 // n
              case (2, 2) => j2
              case (1, 1) => (b + hh + 1) >> 1 // e
              case (3, 1) => (b + hRight + 1) >> 1 // g
              case (1, 3) => (hh + bDown + 1) >> 1 // p
              case (3, 3) => (hRight + bDown + 1) >> 1 // r
              case (2, 1) => (b + j2 + 1) >> 1 // f
              case (2, 3) => (bDown + j2 + 1) >> 1 // q
              case (1, 2) => (hh + j2 + 1) >> 1 // i
              case (3, 2) => (hRight + j2 + 1) >> 1 // k
              case _ => G // unreachable
            }
          }
        out(j * bw + i) = v
        i += 1
      }
      j += 1
    }
    out
  }

  /** Chroma eighth-sample bilinear (§8.4.2.2.2): the luma MV applies
    * directly — chroma is half resolution, so the same quarter-pel MV is
    * eighth-pel in chroma samples. (cx, cy) are eighth-pel positions:
    * 8·x0c + mv (mv still in luma quarter units over chroma geometry).
    */
  def chromaBlock(ref: Array[Int], w: Int, h: Int,
      ex: Int, ey: Int, bw: Int, bh: Int): Array[Int] = {
    val xInt = ex >> 3
    val yInt = ey >> 3
    val xF = ex & 7
    val yF = ey & 7
    val out = new Array[Int](bw * bh)
    @inline def p(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      ref(cy * w + cx)
    }
    var j = 0
    while (j < bh) {
      var i = 0
      while (i < bw) {
        val x = xInt + i
        val y = yInt + j
        out(j * bw + i) =
          ((8 - xF) * (8 - yF) * p(x, y) + xF * (8 - yF) * p(x + 1, y) +
            (8 - xF) * yF * p(x, y + 1) + xF * yF * p(x + 1, y + 1) + 32) >> 6
        i += 1
      }
      j += 1
    }
    out
  }
}
