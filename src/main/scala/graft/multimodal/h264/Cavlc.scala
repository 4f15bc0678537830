package graft.multimodal.h264

import CavlcTables.Code

/** CAVLC residual block coding (ITU-T H.264 §9.2): coeff_token,
  * trailing-one signs, level_prefix/suffix, total_zeros, run_before.
  * Blocks are exchanged in SCAN order (zig-zag already applied by the
  * caller); `maxNumCoeff` is 16 (luma/chroma 4×4), 15 (AC-only) or 4
  * (chroma DC 4:2:0, nC = −1).
  */
object Cavlc {

  /** Decoded block: coefficient levels in scan order (length
    * maxNumCoeff) and the totalCoeff for downstream nC derivation.
    */
  final case class Block(coeffs: Array[Int], totalCoeff: Int)

  private def tokenTable(nC: Int): Array[Array[Code]] =
    if (nC == -1) CavlcTables.coeffTokenChromaDc
    else if (nC < 2) CavlcTables.coeffToken0
    else if (nC < 4) CavlcTables.coeffToken2
    else CavlcTables.coeffToken4

  // decode maps: (len << 16 | bits) → (t1 << 8 | tc), built once
  private def decodeMap(t: Array[Array[Code]]): java.util.HashMap[Int, Int] = {
    val m = new java.util.HashMap[Int, Int]()
    for (t1 <- 0 until 4; tc <- 0 until 17; c = t(t1)(tc) if c != null)
      m.put((c.len << 16) | c.bits, (t1 << 8) | tc)
    m
  }
  private val tokenMaps = CavlcTables.coeffTokenTables.map {
    case (_, t) => (t, decodeMap(t))
  }.toMap
  private def vlcMap(rows: Array[Array[Code]]): Array[java.util.HashMap[Int, Int]] =
    rows.map { row =>
      val m = new java.util.HashMap[Int, Int]()
      row.zipWithIndex.foreach { case (c, v) => m.put((c.len << 16) | c.bits, v) }
      m
    }
  private val totalZeros4x4Maps = vlcMap(CavlcTables.totalZeros4x4)
  private val totalZerosCdcMaps = vlcMap(CavlcTables.totalZerosChromaDc)
  private val runBeforeMaps = vlcMap(CavlcTables.runBefore)

  /** Read one variable-length code from a (len,bits)→value map (≤16 bit). */
  private def readVlc(br: BitReader, m: java.util.HashMap[Int, Int], what: String): Int = {
    var bits = 0
    var len = 0
    while (len < 17) {
      bits = (bits << 1) | br.u1()
      len += 1
      val key = (len << 16) | bits
      if (m.containsKey(key)) return m.get(key)
    }
    throw new IllegalArgumentException(s"invalid $what codeword (corrupt stream)")
  }

  def decodeBlock(br: BitReader, nC: Int, maxNumCoeff: Int): Block = {
    val coeffs = new Array[Int](maxNumCoeff)
    // coeff_token
    val (totalCoeff, trailingOnes) =
      if (nC >= 8) {
        // 6-bit FLC: 4·(TotalCoeff−1) + TrailingOnes; the unused value 3
        // (tc=1,t1=3 cannot occur) codes (0,0)
        val v = br.u(6)
        if (v == 3) (0, 0) else ((v >> 2) + 1, v & 3)
      } else {
        val packed = readVlc(br, tokenMaps(tokenTable(nC)), "coeff_token")
        (packed & 0xFF, packed >> 8)
      }
    if (totalCoeff == 0) return Block(coeffs, 0)
    require(totalCoeff <= maxNumCoeff, "totalCoeff exceeds block size")

    // levels, highest scan position first
    val levels = new Array[Int](totalCoeff)
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) {
        levels(i) = if (br.u1() == 1) -1 else 1
      } else {
        var levelPrefix = 0
        while (br.u1() == 0) {
          levelPrefix += 1
          require(levelPrefix <= 32, "level_prefix too long")
        }
        val levelSuffixSize =
          if (levelPrefix == 14 && suffixLength == 0) 4
          else if (levelPrefix >= 15) levelPrefix - 3
          else suffixLength
        var levelCode = (math.min(15, levelPrefix) << suffixLength) +
          (if (levelSuffixSize > 0) br.u(levelSuffixSize) else 0)
        if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
        if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) =
          if ((levelCode & 1) == 0) (levelCode + 2) >> 1
          else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // total_zeros (the shared 4x4 table can code up to 16−tc zeros, but
    // an AC block only holds 15 — bound it or a corrupt stream indexes
    // outside the coefficient array)
    val totalZeros =
      if (totalCoeff == maxNumCoeff) 0
      else if (nC == -1) readVlc(br, totalZerosCdcMaps(totalCoeff - 1), "total_zeros(cdc)")
      else readVlc(br, totalZeros4x4Maps(totalCoeff - 1), "total_zeros")
    require(totalCoeff + totalZeros <= maxNumCoeff,
      s"total_zeros $totalZeros overflows the block (corrupt stream)")

    // place levels by run_before
    var zerosLeft = totalZeros
    var pos = totalCoeff + totalZeros - 1
    i = 0
    while (i < totalCoeff) {
      coeffs(pos) = levels(i)
      if (i < totalCoeff - 1) {
        val run =
          if (zerosLeft == 0) 0
          else readVlc(br, runBeforeMaps(math.min(zerosLeft, 7) - 1), "run_before")
        require(run <= zerosLeft, s"run_before $run > zerosLeft $zerosLeft (corrupt stream)")
        zerosLeft -= run
        pos -= 1 + run
      }
      i += 1
    }
    Block(coeffs, totalCoeff)
  }

  // ---------------------------------------------------------------- encode

  private def writeCode(bw: BitWriter, c: Code): Unit = bw.putBits(c.bits, c.len)

  /** Encode one block (scan-order coefficients). Returns totalCoeff. */
  def encodeBlock(bw: BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val n = coeffs.length
    // gather nonzeros, highest scan position first
    val nz = new scala.collection.mutable.ArrayBuffer[(Int, Int)] // (pos, level)
    var p = n - 1
    while (p >= 0) { if (coeffs(p) != 0) nz += ((p, coeffs(p))); p -= 1 }
    val totalCoeff = nz.length
    // trailing ones: up to three |level|==1 at the head of the list
    var trailingOnes = 0
    while (trailingOnes < 3 && trailingOnes < totalCoeff &&
      math.abs(nz(trailingOnes)._2) == 1) trailingOnes += 1

    // coeff_token
    if (nC >= 8) {
      val v = if (totalCoeff == 0) 3 else ((totalCoeff - 1) << 2) | trailingOnes
      bw.putBits(v, 6)
    } else {
      val code = tokenTable(nC)(trailingOnes)(totalCoeff)
      require(code != null, s"no coeff_token for t1=$trailingOnes tc=$totalCoeff")
      writeCode(bw, code)
    }
    if (totalCoeff == 0) return 0

    // levels
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      val level = nz(i)._2
      if (i < trailingOnes) {
        bw.put(if (level < 0) 1 else 0)
      } else {
        var levelCode =
          if (level > 0) 2 * level - 2 else -2 * level - 1
        if (i == trailingOnes && trailingOnes < 3) {
          require(math.abs(level) >= 2, "first non-T1 level must be |l|>=2")
          levelCode -= 2
        }
        writeLevel(bw, levelCode, suffixLength)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // total_zeros
    val highestPos = nz(0)._1
    val totalZeros = highestPos + 1 - totalCoeff
    if (totalCoeff < n) {
      val row = if (nC == -1) CavlcTables.totalZerosChromaDc(totalCoeff - 1)
        else CavlcTables.totalZeros4x4(totalCoeff - 1)
      writeCode(bw, row(totalZeros))
    }

    // run_before
    var zerosLeft = totalZeros
    i = 0
    while (i < totalCoeff - 1 && zerosLeft > 0) {
      val run = nz(i)._1 - nz(i + 1)._1 - 1
      writeCode(bw, CavlcTables.runBefore(math.min(zerosLeft, 7) - 1)(run))
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

  /** Write levelCode with the §9.2.2.1 prefix/suffix scheme (inverse of
    * the decode arithmetic; covers the escape ranges).
    */
  private def writeLevel(bw: BitWriter, levelCode: Int, suffixLength: Int): Unit = {
    if (suffixLength == 0) {
      if (levelCode < 14) { bw.putBits(0, levelCode); bw.put(1) }
      else if (levelCode < 30) { // prefix 14, 4-bit suffix
        bw.putBits(0, 14); bw.put(1); bw.putBits(levelCode - 14, 4)
      } else {
        // prefix 15: levelCode = 15<<0 + suffix + 15 → suffix = lc - 30
        writeEscape(bw, levelCode - 15, 0)
      }
    } else {
      val maxDirect = (15 << suffixLength) - 1
      if (levelCode <= maxDirect) {
        val prefix = levelCode >> suffixLength
        bw.putBits(0, prefix); bw.put(1)
        bw.putBits(levelCode & ((1 << suffixLength) - 1), suffixLength)
      } else {
        writeEscape(bw, levelCode, suffixLength)
      }
    }
  }

  /** Escape coding with level_prefix ≥ 15: decode computes
    * `lc = (15 << sl) + suffix (+15 if sl==0) (+ (1<<(p-3)) - 4096 if p≥16)`.
    * Choose the smallest prefix p ≥ 15 whose suffix range holds the value.
    */
  private def writeEscape(bw: BitWriter, adjusted: Int, suffixLength: Int): Unit = {
    var p = 15
    while (p <= 31) {
      val size = p - 3
      val base = (15 << suffixLength) + (if (p >= 16) (1 << size) - 4096 else 0)
      val suffix = adjusted - base
      if (suffix >= 0 && suffix < (1 << size)) {
        bw.putBits(0, p); bw.put(1); bw.putBits(suffix, size)
        return
      }
      p += 1
    }
    throw new IllegalArgumentException(s"level out of CAVLC range: $adjusted")
  }
}
