package graft.multimodal.h264

/** Bit-level I/O for H.264 RBSP payloads (ITU-T H.264 §7.2, §9.1).
  *
  * The NAL layer wraps an RBSP in emulation-prevention bytes; readers here
  * always operate on the UNESCAPED rbsp bytes ([[Nal.unescape]]). Exp-Golomb
  * codes follow §9.1: `ue(v)` is leadingZeroBits zeros, a 1, then
  * leadingZeroBits info bits; `se(v)` maps k → (−1)^(k+1)·⌈k/2⌉.
  */
final class BitReader(data: Array[Byte]) {
  private var bytePos = 0
  private var bitPos = 0 // 0..7, MSB first

  def position: Int = bytePos * 8 + bitPos

  def remainingBits: Int = data.length * 8 - position

  def u1(): Int = {
    require(bytePos < data.length, s"bitstream exhausted at byte $bytePos")
    val b = (data(bytePos) >> (7 - bitPos)) & 1
    bitPos += 1
    if (bitPos == 8) { bitPos = 0; bytePos += 1 }
    b
  }

  def u(n: Int): Int = {
    require(n <= 31, s"u($n) exceeds Int")
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | u1(); i += 1 }
    v
  }

  def ue(): Int = {
    var zeros = 0
    while (u1() == 0) {
      zeros += 1
      require(zeros <= 31, "ue(v) prefix too long (corrupt stream)")
    }
    (1 << zeros) - 1 + u(zeros)
  }

  def se(): Int = {
    val k = ue()
    if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
  }

  def byteAligned: Boolean = bitPos == 0

  def alignToByte(): Unit = while (bitPos != 0) u1()

  /** §7.2 more_rbsp_data: true iff bits remain before the final
    * rbsp_stop_one_bit (the last 1 bit in the payload).
    */
  def moreRbspData(): Boolean = {
    if (bytePos >= data.length) return false
    // find the last set bit in the stream
    var lastByte = data.length - 1
    while (lastByte >= 0 && data(lastByte) == 0) lastByte -= 1
    if (lastByte < 0) return false
    var lastBit = 7
    while (((data(lastByte) >> (7 - lastBit)) & 1) == 0) lastBit -= 1
    position < lastByte * 8 + lastBit
  }
}

/** MSB-first bit writer with §7.4.1 rbsp_trailing_bits support. */
final class BitWriter {
  private val buf = new java.io.ByteArrayOutputStream()
  private var cur = 0
  private var nBits = 0

  def put(bit: Int): Unit = {
    cur = (cur << 1) | (bit & 1)
    nBits += 1
    if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
  }

  def putBits(value: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { put((value >> i) & 1); i -= 1 }
  }

  def ue(v: Int): Unit = {
    require(v >= 0, s"ue($v)")
    val code = v + 1
    val len = 32 - Integer.numberOfLeadingZeros(code)
    putBits(0, len - 1)
    putBits(code, len)
  }

  def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)

  def byteAligned: Boolean = nBits == 0

  def alignZero(): Unit = while (nBits != 0) put(0)

  /** rbsp_stop_one_bit + zero padding to a byte boundary. */
  def rbspTrailing(): Unit = { put(1); alignZero() }

  def bitLength: Int = buf.size * 8 + nBits

  def toBytes: Array[Byte] = {
    require(nBits == 0, s"unaligned writer ($nBits stray bits)")
    buf.toByteArray
  }
}

/** NAL-unit framing (§7.3.1, §7.4.1): emulation-prevention escape and the
  * Annex-B / AVCC packing used by the MP4 sample layer.
  */
object Nal {

  /** Strip emulation_prevention_three_byte: 00 00 03 → 00 00. */
  def unescape(nal: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var zeros = 0
    var i = from
    while (i < to) {
      val b = nal(i) & 0xFF
      if (zeros >= 2 && b == 3) {
        zeros = 0 // drop the escape byte
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Insert emulation-prevention bytes into an RBSP payload. */
  def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xFF
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** One complete NAL unit: header byte (forbidden 0, nal_ref_idc, type)
    * plus the escaped RBSP.
    */
  def unit(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] = {
    val esc = escape(rbsp)
    val out = new Array[Byte](1 + esc.length)
    out(0) = ((refIdc << 5) | nalType).toByte
    System.arraycopy(esc, 0, out, 1, esc.length)
    out
  }
}
