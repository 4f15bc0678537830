package graft.sources

/** CCSDS 121.0-B adaptive-entropy (Rice) decoder — the HDF5 `szip`
  * filter (pipeline id 4), written against the public CCSDS 121.0-B-2
  * recommendation and the documented behavior of the szip/libaec
  * implementations libhdf5 links (reference read path:
  * /root/reference/picoprobe/tools/hyperspectral.py:51 via h5py).
  *
  * On-disk chunk payload (libhdf5 `H5Zszip`): a 4-byte little-endian
  * UNCOMPRESSED byte count, then the raw coded stream (HDF5 always sets
  * the szip RAW option, so there is no szlib header). Filter client data
  * (pipeline message): `[options_mask, bits_per_pixel, pixels_per_block,
  * pixels_per_scanline]`.
  *
  * Stream structure: samples split into scanlines of `pixelsPerScanline`
  * (= one reference-sample interval), each scanline into blocks of
  * `pixelsPerBlock` mapped residuals; per block an MSB-first ID field
  * (3 bits for n ≤ 8, 4 for n ≤ 16, 5 for n ≤ 32) selects the coding
  * option:
  *
  *  - `0…0 0` zero-block: an FS codeword gives the run of all-zero
  *    blocks (1..4 direct, 5 = remainder-of-64-block-segment, > 5
  *    off-by-one per the szip convention);
  *  - `0…0 1` second-extension: J/2 FS codewords, each the diagonal
  *    pair index γ = (δ₁+δ₂)(δ₁+δ₂+1)/2 + δ₂;
  *  - id k+1 (1 ≤ id < 2ᶠ−1) split-sample k: the J fundamental-sequence
  *    high parts first, THEN the J k-bit low parts (the "split");
  *    id 1 is FS coding (k = 0);
  *  - all-ones: no compression, J raw n-bit samples.
  *
  * Preprocessing (NN option): the first sample of every scanline is a
  * reference, transmitted raw (n bits) right after its block's ID field,
  * and that block codes J−1 residuals; each later sample is predicted by
  * its left neighbor with the standard CCSDS signed→unsigned mapping
  * (δ = 2Δ for 0 ≤ Δ ≤ θ, 2|Δ|−1 for −θ ≤ Δ < 0, θ+|Δ| beyond, with
  * θ = min(pred, 2ⁿ−1−pred)). The EC option codes raw sample values with
  * no predictor and no references. Zero-block or second-extension IDs on
  * a reference block fail fast by name — an encoder always has the
  * split/FS/no-compression options available there, and the fixture
  * encoder never emits that combination.
  *
  * Supported-subset boundaries (all fail fast by name, never decode
  * wrong):
  *
  *  - **Whole scanlines only**: the chunk's pixel count must be a
  *    multiple of `pixels_per_scanline`, and the scanline a multiple of
  *    `pixels_per_block`. libhdf5's `H5Z__set_local_szip` clamps the
  *    scanline to the chunk's fastest dimension, so chunks it configures
  *    satisfy both, but a foreign writer could emit partial scanlines /
  *    partial trailing blocks (szlib pads them); such streams are
  *    rejected, not padded.
  *  - **Zero-run scope**: zero-block runs are decoded scanline-scoped —
  *    a run may not cross its scanline (reference interval), and the
  *    `remainder-of-segment` codeword (FS value 5) counts to the end of
  *    the current 64-block segment. Validation is against the in-repo
  *    encoder and hand vectors, not a szlib binary; with AT MOST ONE
  *    segment per scanline the convention is unambiguous (segment start
  *    = scanline start), so scanlines of more than 64 blocks — where
  *    szlib's segment numbering might straddle reference intervals —
  *    are rejected up front rather than risked. Every shape libhdf5's
  *    `H5Z__set_local_szip` configures (J ≥ 2, scanline ≤ 128 samples)
  *    is single-segment and inside the envelope.
  *  - Bit depths 1..16 and 32 (a byte-sized HDF5 datatype); 17..31-bit
  *    pixels would need szlib's 3-byte container.
  */
object Szip {

  // szlib option-mask bits (public szlib.h values, mirrored by H5Zpublic.h)
  val AllowK13 = 1
  val Chip = 2
  val EC = 4
  val LSB = 8
  val MSB = 16
  val NN = 32
  val Raw = 128

  /** Bit overruns fail BY NAME: a truncated or corrupt stream must read
    * as "szip: coded stream truncated", not a bare array index crash.
    */
  private final class BitReader(in: Array[Byte]) {
    // Long positions: `in.length << 3` overflows Int past 256 MiB, which
    // would reject every VALID large stream as "truncated at bit 0"
    private var bitPos = 0L
    private val endBit = in.length.toLong << 3
    private def checkBit(): Unit =
      if (bitPos >= endBit)
        throw new IllegalArgumentException(
          s"szip: coded stream truncated at bit $bitPos of $endBit")
    def get(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        checkBit()
        val byte = in((bitPos >>> 3).toInt)
        v = (v << 1) | ((byte >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    def getInt(n: Int): Int = get(n).toInt
    /** Fundamental sequence: count of 0-bits before the terminating 1. */
    def fs(): Int = {
      var v = 0
      checkBit()
      while (((in((bitPos >>> 3).toInt) >> (7 - (bitPos & 7))) & 1) == 0) {
        bitPos += 1
        v += 1
        checkBit()
        if (v > (1 << 24))
          throw new IllegalArgumentException("szip: runaway FS codeword")
      }
      bitPos += 1
      v
    }
  }

  /** Decode one HDF5 szip chunk payload (size prefix + raw stream) into
    * little- or big-endian sample bytes per the LSB/MSB option.
    */
  def decodeHdf5(stored: Array[Byte], cd: Vector[Int]): Array[Byte] = {
    require(cd.length >= 4, s"szip filter: ${cd.length} client values (need 4)")
    val (mask, n, j, pps) = (cd(0), cd(1), cd(2), cd(3))
    require(stored.length >= 4,
      s"szip: chunk payload of ${stored.length} bytes has no size prefix")
    val outBytes = ((stored(0) & 0xFF) | ((stored(1) & 0xFF) << 8) |
      ((stored(2) & 0xFF) << 16) | ((stored(3) & 0xFF) << 24))
    decode(java.util.Arrays.copyOfRange(stored, 4, stored.length),
      mask, n, j, pps, outBytes)
  }

  def decode(in: Array[Byte], mask: Int, n: Int, j: Int, pps: Int,
      outBytes: Int): Array[Byte] = {
    require((mask & Raw) != 0, "szip: non-raw (headered) stream not supported")
    require((mask & Chip) == 0, "szip: chip option not supported")
    val nn = (mask & NN) != 0
    require(nn || (mask & EC) != 0, "szip: neither NN nor EC option set")
    require(n >= 1 && (n <= 16 || n == 32),
      s"szip: $n bits/pixel not supported (1..16, 32 — the depths a " +
        "byte-sized HDF5 datatype yields; 17..31 would need szlib's " +
        "3-byte pixel container)")
    require(j >= 2 && j <= 32 && j % 2 == 0, s"szip: pixels/block $j")
    // pps ≤ 0 would pass every modular check below (0 % j == 0, 0/j ≤ 64)
    // and then `base += pps` never advances — an infinite loop, not an
    // error. A negative outBytes (size prefix with the top bit set) would
    // crash allocation namelessly, and -total % pps == 0 also passes.
    require(pps >= j, s"szip: pixels/scanline $pps smaller than block $j")
    require(outBytes >= 0, s"szip: negative uncompressed size $outBytes")
    require(pps % j == 0, s"szip: scanline $pps not a multiple of block $j")
    require(pps / j <= 64,
      s"szip: scanline of ${pps / j} blocks spans multiple 64-block " +
        "segments — remainder-of-segment runs are only validated for " +
        "single-segment scanlines (every libhdf5-configured shape)")
    val bytesPerPixel = if (n <= 8) 1 else if (n <= 16) 2 else 4
    val total = outBytes / bytesPerPixel
    require(total * bytesPerPixel == outBytes,
      s"szip: $outBytes bytes not a multiple of pixel size $bytesPerPixel")
    require(total % pps == 0,
      s"szip: $total pixels not a multiple of scanline $pps (partial " +
        "scanlines not supported)")
    val idBits = if (n <= 8) 3 else if (n <= 16) 4 else 5
    val noCompId = (1 << idBits) - 1
    val xmax = (1L << n) - 1
    // a corrupt size prefix can claim gigabytes, and `new Array[Long]
    // (total)` would allocate them BEFORE the first bit is read — heap
    // exhaustion or a 10 s GC burn, not a parse error (found by direct
    // payload fuzz). Even the densest legal coding (a 64-block zero run:
    // 64·j samples for idBits+2 bits) bounds what `in` can encode, so a
    // claim past that bound is unsatisfiable and refuses by name here.
    val maxSamples =
      (in.length.toLong * 8 / (idBits + 2) + 1) * 64L * j
    require(total <= maxSamples,
      s"szip: size prefix claims $total samples but a ${in.length}-byte " +
        s"stream cannot encode more than $maxSamples")
    val bits = new BitReader(in)
    val out = new Array[Long](total)

    var base = 0
    while (base < total) { // one scanline = one reference interval
      val deltas = new Array[Long](pps) // mapped residuals (or EC raw values)
      var ref = -1L
      var b = 0
      val blocks = pps / j
      while (b < blocks) {
        val isRefBlock = nn && b == 0
        val id = bits.getInt(idBits)
        if (id == 0) {
          val second = bits.get(1) == 1
          if (isRefBlock)
            throw new IllegalArgumentException(
              if (second) "szip: second-extension over a reference block " +
                "not supported"
              else "szip: zero-block run starting at a reference block " +
                "not supported")
          if (second) { // second extension: J/2 diagonal pair indexes
            var i = 0
            while (i < j / 2) {
              val gamma = bits.fs().toLong
              var m = 0L
              while ((m + 1) * (m + 2) / 2 <= gamma) m += 1
              val d2 = gamma - m * (m + 1) / 2
              deltas(b * j + 2 * i) = m - d2
              deltas(b * j + 2 * i + 1) = d2
              i += 1
            }
            b += 1
          } else { // zero-block run
            val z = bits.fs() + 1
            val run =
              if (z == 5) 64 - (b % 64) // remainder of 64-block segment
              else if (z > 5) z - 1
              else z
            require(b + run <= blocks,
              s"szip: zero-block run $run exceeds scanline at block $b")
            // deltas are already zero-initialized
            b += run
          }
        } else {
          // split-sample k = id − 1 (id = noCompId: raw samples)
          val coded = if (isRefBlock) j - 1 else j
          val off = b * j + (if (isRefBlock) 1 else 0)
          if (isRefBlock) ref = bits.get(n)
          if (id == noCompId) {
            var i = 0
            while (i < coded) { deltas(off + i) = bits.get(n); i += 1 }
          } else {
            val k = id - 1
            require(k < n, s"szip: split k=$k for $n-bit samples")
            var i = 0
            while (i < coded) { deltas(off + i) = bits.fs().toLong << k; i += 1 }
            i = 0
            while (i < coded) { deltas(off + i) |= bits.get(k); i += 1 }
          }
          b += 1
        }
      }
      // un-map: NN restores via the left-neighbor predictor; EC residuals
      // ARE the sample values
      if (nn) {
        out(base) = ref
        var i = 1
        var pred = ref
        while (i < pps) {
          val d = deltas(i)
          val theta = math.min(pred, xmax - pred)
          val delta =
            if (d <= 2 * theta) { if (d % 2 == 0) d / 2 else -(d + 1) / 2 }
            else if (theta == pred) d - theta // only positive Δ remain
            else theta - d                    // only negative Δ remain
          pred += delta
          out(base + i) = pred
          i += 1
        }
      } else {
        var i = 0
        while (i < pps) { out(base + i) = deltas(i); i += 1 }
      }
      base += pps
    }

    // repack samples; pixel byte order per the LSB/MSB option
    val res = new Array[Byte](outBytes)
    val lsb = (mask & MSB) == 0
    var i = 0
    while (i < total) {
      val v = out(i)
      var by = 0
      while (by < bytesPerPixel) {
        val shift = if (lsb) 8 * by else 8 * (bytesPerPixel - 1 - by)
        res(bytesPerPixel * i + by) = ((v >> shift) & 0xFF).toByte
        by += 1
      }
      i += 1
    }
    res
  }
}
