package graft.sources

/** CCSDS 121.0-B Rice ENCODER — the fixture-side counterpart of
  * [[Szip]], emitting the HDF5 szip chunk payload (4-byte little-endian
  * uncompressed size + raw coded stream). Per block it genuinely
  * optimizes over the legal coding options (zero-block runs,
  * second-extension, FS/k-split, no-compression), so round-trip fixtures
  * exercise every decoder path, not just one. Reference blocks (first of
  * a scanline under NN) only consider FS/k-split/no-compression — the
  * combination the decoder supports, and one an encoder is always free
  * to choose.
  */
object SzipTestEncoder {

  private final class BitWriter {
    private val out = collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    // (cur holds < 8 bits; the Long put shifts through it byte-wise)
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = ((cur << 1) | ((v >> i) & 1L)).toInt
        nBits += 1
        if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def fs(v: Long): Unit = { // v zeros then a terminating 1
      var i = 0L
      while (i < v) { put(0, 1); i += 1 }
      put(1, 1)
    }
    def result(): Array[Byte] = {
      if (nBits > 0) out += (cur << (8 - nBits)).toByte
      out.toArray
    }
  }

  def encodeHdf5(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.size == 4, "szip cd: [mask, bpp, ppb, pps]")
    val stream = encode(raw, cd(0), cd(1), cd(2), cd(3))
    val out = new Array[Byte](4 + stream.length)
    val sz = raw.length
    out(0) = (sz & 0xFF).toByte
    out(1) = ((sz >> 8) & 0xFF).toByte
    out(2) = ((sz >> 16) & 0xFF).toByte
    out(3) = ((sz >> 24) & 0xFF).toByte
    System.arraycopy(stream, 0, out, 4, stream.length)
    out
  }

  def encode(raw: Array[Byte], mask: Int, n: Int, j: Int,
      pps: Int): Array[Byte] = {
    val nn = (mask & Szip.NN) != 0
    val bytesPerPixel = if (n <= 8) 1 else if (n <= 16) 2 else 4
    val lsb = (mask & Szip.MSB) == 0
    val total = raw.length / bytesPerPixel
    require(total * bytesPerPixel == raw.length && total % pps == 0 &&
      pps % j == 0, s"szip encode: ${raw.length} bytes, pps=$pps, j=$j")
    val idBits = if (n <= 8) 3 else if (n <= 16) 4 else 5
    val noCompId = (1 << idBits) - 1
    val maxK = math.min(n - 1, noCompId - 2) // id = k+1 must stay below all-ones
    val xmax = (1L << n) - 1

    val px = new Array[Long](total)
    var i = 0
    while (i < total) {
      var v = 0L
      var by = 0
      while (by < bytesPerPixel) {
        val shift = if (lsb) 8 * by else 8 * (bytesPerPixel - 1 - by)
        v |= (raw(bytesPerPixel * i + by) & 0xFFL) << shift
        by += 1
      }
      px(i) = v
      i += 1
    }

    val bits = new BitWriter
    var base = 0
    while (base < total) {
      // preprocess one scanline
      val deltas = new Array[Long](pps)
      if (nn) {
        var k = 1
        while (k < pps) {
          val pred = px(base + k - 1)
          val d = px(base + k) - pred
          val theta = math.min(pred, xmax - pred)
          deltas(k) =
            if (d >= 0 && d <= theta) 2 * d
            else if (d < 0 && d >= -theta) -2 * d - 1
            else theta + math.abs(d)
          k += 1
        }
      } else {
        var k = 0
        while (k < pps) { deltas(k) = px(base + k); k += 1 }
      }

      val blocks = pps / j
      var b = 0
      while (b < blocks) {
        val isRef = nn && b == 0
        val off = b * j + (if (isRef) 1 else 0)
        val coded = if (isRef) j - 1 else j

        // coalesce a maximal run of all-zero non-ref blocks
        def allZero(bi: Int): Boolean = {
          val s = bi * j + (if (nn && bi == 0) 1 else 0)
          val c = if (nn && bi == 0) j - 1 else j
          var z = true
          var q = 0
          while (q < c && z) { z = deltas(s + q) == 0; q += 1 }
          z
        }
        if (!isRef && allZero(b)) {
          var run = 1
          while (b + run < blocks && allZero(b + run) && run < 63) run += 1
          // zero-run cost: id+1 + fs bits; per-block FS coding costs
          // run*(idBits + j) — the run always wins for run ≥ 1 here
          bits.put(0, idBits)
          bits.put(0, 1)
          bits.fs(if (run <= 4) run - 1L else run.toLong)
          b += run
        } else {
          // candidate costs over the coded samples
          var bestK = -1
          var bestCost = Long.MaxValue
          var k = 0
          while (k <= maxK) {
            var c = (idBits + coded * (k + 1)).toLong // terminators + low bits
            var q = 0
            while (q < coded) { c += (deltas(off + q) >>> k); q += 1 }
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          val noCompCost = (idBits + coded * n).toLong
          var seCost = Long.MaxValue
          if (!isRef) { // pairs need an even coded count from slot 0
            seCost = idBits + 1L
            var q = 0
            while (q < j && seCost < Long.MaxValue / 2) {
              val d1 = deltas(b * j + q)
              val d2 = deltas(b * j + q + 1)
              val s = d1 + d2
              // gamma ~ s^2/2 overflows for wide samples; such blocks
              // can never win on cost anyway
              if (s > (1L << 20)) seCost = Long.MaxValue / 2
              else seCost += s * (s + 1) / 2 + d2 + 1
              q += 2
            }
          }
          if (seCost < bestCost && seCost < noCompCost) {
            bits.put(0, idBits)
            bits.put(1, 1)
            var q = 0
            while (q < j) {
              val d1 = deltas(b * j + q)
              val d2 = deltas(b * j + q + 1)
              val s = d1 + d2
              bits.fs(s * (s + 1) / 2 + d2)
              q += 2
            }
          } else if (noCompCost <= bestCost) {
            bits.put(noCompId, idBits)
            if (isRef) bits.put(px(base), n)
            var q = 0
            while (q < coded) { bits.put(deltas(off + q), n); q += 1 }
          } else {
            bits.put(bestK + 1, idBits)
            if (isRef) bits.put(px(base), n)
            var q = 0
            while (q < coded) { bits.fs(deltas(off + q) >>> bestK); q += 1 }
            if (bestK > 0) {
              q = 0
              while (q < coded) {
                bits.put(deltas(off + q) & ((1 << bestK) - 1), bestK)
                q += 1
              }
            }
          }
          b += 1
        }
      }
      base += pps
    }
    bits.result()
  }
}
