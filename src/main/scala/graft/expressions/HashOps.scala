package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the graft codegen expressions.
  *
  * Each method is called once per row from whole-stage-generated code (see
  * [[GraftExpressions]]), replacing chains of interpreted higher-order
  * functions (`transform`/`aggregate` lambdas evaluate per *element* through
  * the interpreter; these run per *row* as plain JVM loops — the difference
  * is ~50× on the MinHash path). All outputs are primitive
  * `UnsafeArrayData`/scalars: no boxing, no codegen fallback.
  *
  * Hashing uses Spark's own XXH64 (seed 42, same as `xxhash64`), so results
  * are deterministic across partitionings, reruns and cluster sizes.
  */
object HashOps {

  val Seed = 42L

  private def tokenHashes(text: UTF8String): Array[Long] = {
    val toks = text.toString.split(" ", -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), Seed)
      i += 1
    }
    out
  }

  /** Sorted distinct 64-bit hashes of word n-gram shingles. Hashing the
    * shingles (8 bytes each) instead of carrying strings keeps the LSH
    * shuffle narrow at scale; sorting makes set ops a linear merge.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(text)
    val m = th.length - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val sh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < m) {
      if (sh(i) != sh(i - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sh, w))
  }

  /** Positional word k-gram hashes in document order — position `i`
    * hashes tokens `[i, i+n)`; NOT deduplicated or sorted, unlike
    * [[shingleHashes]]. The unit of duplicate-span detection: a hash
    * seen at two positions anywhere in the corpus marks both spans as
    * duplicated text.
    */
  def kgramHashes(text: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(text)
    val m = th.length - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val sh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sh)
  }

  /** All positional k-gram hashes of `text` for EVERY width in `ns` off a
    * SINGLE tokenization — rows `(n, pos, h)`, hash-identical per width to
    * [[kgramHashes]] (same XXH64 chain). Backs the width-sweep generator
    * (t31): one corpus scan + one tokenization replace |ns| of each, which
    * at 100 TB is |ns|× less scan IO for the same output.
    */
  def kgramHashesMulti(text: UTF8String, ns: Array[Int])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val th = tokenHashes(text)
    ns.iterator.flatMap { n =>
      val m = th.length - n + 1
      (0 until math.max(m, 0)).iterator.map { i =>
        var h = Seed
        var j = 0
        while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
        org.apache.spark.sql.catalyst.InternalRow(n, i, h)
      }
    }
  }

  /** Dictionary-safe bulk copies. `ColumnarArray.toFloatArray`/
    * `toLongArray` bulk-arraycopy the column vector's PLAIN backing
    * store, which is null when the parquet page is DICTIONARY-encoded
    * (parquet-mr's default for repetitive columns) — an input-dependent
    * NPE that plain test fixtures never trigger but any real table can
    * (caught by GrowthSpan's sf1ish slice, whose Spark-written
    * embeddings dictionary-encode). The INDEXED accessors resolve the
    * dictionary per element, so every ArrayData input crossing into
    * these kernels copies through them.
    */
  def floats(v: ArrayData): Array[Float] = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = v.getFloat(i); i += 1 }
    out
  }

  /** See [[floats]] — same dictionary-page hazard via `getLongs`. */
  def longs(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = v.getLong(i); i += 1 }
    out
  }

  /** k-permutation MinHash signature over a shingle-hash set: one pass per
    * row, min over `XXH64.hashLong(shingle, i)` for each of the k salts.
    */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val sh = longs(shingles)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val h = XXH64.hashLong(sh(j), i.toLong)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Band hashes of a MinHash signature: the signature splits into `bands`
    * equal bands, each chained-hashed to one bucket key.
    */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val s = longs(sig)
    // Divisibility is load-bearing: a remainder silently drops the trailing
    // signature entries from every band, and bands > length makes rows = 0 so
    // EVERY row hashes to the constant seed in EVERY band — all documents
    // become LSH candidates of each other (quadratic blowup at scale).
    if (bands < 1 || s.length % bands != 0)
      throw new IllegalArgumentException(
        s"band_hashes: bands ($bands) must divide the minhash signature length (${s.length})")
    val rows = s.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Seed
      var j = b * rows
      val end = j + rows
      while (j < end) { h = XXH64.hashLong(s(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact Jaccard similarity of two SORTED distinct long arrays (as
    * produced by [[shingleHashes]]): linear merge, no hash sets.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val x = longs(a)
    val y = longs(b)
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, signed
    * vote per bit position, sign → bit.
    */
  def simhash(text: UTF8String): Long = {
    val th = tokenHashes(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Karp–Rabin-style rolling hash over whitespace tokens (order-sensitive
    * document fingerprint): h = h·31 + xxh64(token), two's-complement
    * wrap-around — the JVM's natural long arithmetic, independent of the
    * engine's ANSI overflow mode.
    */
  def rollingHash(text: UTF8String): Long = {
    val th = tokenHashes(text)
    var h = 1125899906842597L
    var i = 0
    while (i < th.length) { h = h * 31L + th(i); i += 1 }
    h
  }

  /** Cosine similarity of two float vectors with sequential double
    * accumulation — bit-identical to DuckDB's
    * `LIST_COSINE_SIMILARITY(CAST(... AS DOUBLE[]))` fold, so oracle
    * hash-compares pass on the similarity VALUES, not just the ids.
    * The final clamp to [-1, 1] mirrors DuckDB: identical vectors can
    * round to 1 + 1ulp under dot/(√na·√nb) and DuckDB pins that to 1.0.
    */
  /** Exact long-array dot product (the quantized-vector kernel: inputs
    * are small integers, so products and the sum stay far inside Long).
    * Length mismatch truncates to the shorter side — NOTE this differs
    * from the `aggregate(zip_with(...))` chain it replaced, which padded
    * with nulls and returned NULL on mismatch; callers (s9/s10 ADC)
    * construct both sides at the same fixed dim, so the case is unreachable
    * there, and truncation keeps the kernel branch-free. Null ELEMENTS are
    * likewise out of contract (getLong would read them as 0): analysis
    * can't see containsNull, and this kernel runs per candidate in the
    * measured ADC hot loop, so unlike cms_order it carries no per-element
    * guard — both callers quantize non-null float arrays they just built.
    */
  def longDot(a: ArrayData, b: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val x = floats(a)
    val y = floats(b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      val yi = y(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    if (r > 1.0) 1.0 else if (r < -1.0) -1.0 else r
  }

  /** IVF cell assignment: argmax dot product against `k` row-major
    * centroids (pass them L2-normalized for cosine ranking). Ties break to
    * the lowest cell id.
    */
  def nearestCell(v: ArrayData, cents: Array[Double], k: Int): Int = {
    val x = floats(v)
    val dim = x.length
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) { dot += x(i).toDouble * cents(off + i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Top-`nprobe` IVF cells by centroid dot product (the query-side probe
    * list). Selection over k cells — k is small by construction.
    */
  def nearCells(v: ArrayData, cents: Array[Double], k: Int, nprobe: Int): ArrayData = {
    val x = floats(v)
    val dim = x.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) { dot += x(i).toDouble * cents(off + i); i += 1 }
      dots(c) = dot
      c += 1
    }
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < n) {
      // `best == -1 ||` keeps the selection total when dots are NaN (a NaN
      // query element makes every dot NaN, and NaN never wins `>`): the
      // fallback takes the lowest untaken cell id, consistent with
      // [[nearestCell]]'s all-NaN result (cell 0), instead of indexing
      // taken(-1).
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && (best == -1 || dots(c) > bestDot)) { bestDot = dots(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Deterministic document embedding: L2-normalized binary presence
    * vector of hashed word n-gram shingles in `dim` dimensions (feature
    * hashing). Near-duplicate texts map to nearly identical vectors
    * (cosine ≈ overlap ≈ 2j/(1+j) for Jaccard j); unrelated texts share
    * almost no shingles, so background cosine ≈ |A||B|/(dim·√(|A||B|)) —
    * a wide, thresholdable gap. One JVM pass per row; the output feeds
    * the same LSH/cosine path as any learned embedding.
    */
  def embedShingles(text: UTF8String, n: Int, dim: Int): ArrayData = {
    val sh = longs(shingleHashes(text, n))
    val v = new Array[Float](dim)
    var nnz = 0
    var i = 0
    while (i < sh.length) {
      val d = (((sh(i) % dim) + dim) % dim).toInt
      if (v(d) == 0f) { v(d) = 1f; nnz += 1 }
      i += 1
    }
    if (nnz > 0) {
      val inv = (1.0 / math.sqrt(nnz.toDouble)).toFloat
      var j = 0
      while (j < dim) { if (v(j) != 0f) v(j) = inv; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(v)
  }

  /** All `bands` hyperplane-LSH bucket ids of a float vector in ONE pass:
    * `planes` is row-major (bands·nBits) × dim; band b's bucket packs the
    * sign bits of rows [b·nBits, (b+1)·nBits). One call per row instead of
    * `bands` separate expression evaluations.
    */
  def hyperplaneBuckets(v: ArrayData, planes: Array[Double], nBits: Int,
      bands: Int): ArrayData = {
    val x = floats(v)
    val dim = x.length
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var r = 0
      while (r < nBits) {
        var dot = 0.0
        var i = 0
        val off = (b * nBits + r) * dim
        while (i < dim) { dot += x(i).toDouble * planes(off + i); i += 1 }
        if (dot >= 0) bucket |= (1L << r)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Morton (Z-order) bit interleave of two 31-bit values: bits of `x` at
    * even positions, `y` at odd — the space-filling curve key for
    * two-dimensional file clustering ([[graft.core.Layout.writeZOrdered]]).
    * 31 bits per dimension keeps the result in the positive signed-long
    * range, so ordering by the z-value needs no unsigned tricks.
    */
  def interleave31(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var b = v & 0x7FFFFFFFL
      b = (b | (b << 16)) & 0x0000FFFF0000FFFFL
      b = (b | (b << 8))  & 0x00FF00FF00FF00FFL
      b = (b | (b << 4))  & 0x0F0F0F0F0F0F0F0FL
      b = (b | (b << 2))  & 0x3333333333333333L
      b = (b | (b << 1))  & 0x5555555555555555L
      b
    }
    spread(x) | (spread(y) << 1)
  }

  /** Bloom-filter membership probe against a constant bitset (shipped to
    * executors as a codegen reference object). Double hashing (Kirsch &
    * Mitzenmacher 2006): position i = h1 + i·h2 mod numBits, with h2
    * forced odd so the probe sequence covers the bitset. One call per
    * big-side row inside whole-stage codegen — the pre-shuffle pruning
    * hot path.
    */
  def bloomContains(v: Long, bits: Array[Long], numHashes: Int): Boolean = {
    val numBits = bits.length.toLong * 64L
    val h1 = XXH64.hashLong(v, Seed)
    val h2 = XXH64.hashLong(v, Seed + 1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Set the same probe positions while BUILDING the bitset (aggregate
    * update path — must mirror [[bloomContains]] bit for bit).
    */
  def bloomSet(v: Long, bits: Array[Long], numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64L
    val h1 = XXH64.hashLong(v, Seed)
    val h2 = XXH64.hashLong(v, Seed + 1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Dot product of a float vector with a constant double plane (row-major
    * `planes`, `nBits` rows): returns the packed sign-bit bucket id — the
    * random-hyperplane LSH signature in one pass.
    */
  def hyperplaneBucket(v: ArrayData, planes: Array[Double], nBits: Int): Long = {
    val x = floats(v)
    val dim = x.length
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      val off = b * dim
      while (i < dim) { dot += x(i).toDouble * planes(off + i); i += 1 }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}
