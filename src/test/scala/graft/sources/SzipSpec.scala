package graft.sources

import scala.language.implicitConversions

import org.scalatest.funsuite.AnyFunSuite

/** Codec-level round-trips for the szip (CCSDS 121 Rice) filter: every
  * coding option the decoder implements — zero-block runs, second
  * extension, FS and k-split, no-compression — across 8/16-bit depths,
  * NN and EC preprocessing, and both pixel byte orders. The encoder
  * optimizes per block, so each data shape below forces specific
  * options; the assertions on compressed size pin that the intended
  * option actually engaged (a decoder bug that only round-trips with
  * its own encoder's favorite option would survive a plain equality
  * check).
  */
class SzipSpec extends AnyFunSuite {

  private val NnMask = Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.MSB
  private val EcMask = Szip.Raw | Szip.AllowK13 | Szip.EC | Szip.MSB

  private def roundtrip(px: Seq[Long], mask: Int, n: Int, j: Int,
      pps: Int): Array[Byte] = {
    val bpp = if (n <= 8) 1 else if (n <= 16) 2 else 4
    val lsb = (mask & Szip.MSB) == 0
    val raw = new Array[Byte](px.size * bpp)
    px.zipWithIndex.foreach { case (v, i) =>
      (0 until bpp).foreach { by =>
        val shift = if (lsb) 8 * by else 8 * (bpp - 1 - by)
        raw(bpp * i + by) = ((v >> shift) & 0xFF).toByte
      }
    }
    val coded = SzipTestEncoder.encode(raw, mask, n, j, pps)
    val back = Szip.decode(coded, mask, n, j, pps, raw.length)
    assert(back.toSeq == raw.toSeq)
    coded
  }

  private implicit def ints2longs(xs: Seq[Int]): Seq[Long] = xs.map(_.toLong)

  test("8-bit NN: smooth ramp compresses via low-k split samples") {
    val px = (0 until 256).map(i => 100 + (math.sin(i / 7.0) * 40).toInt)
    val coded = roundtrip(px, NnMask, n = 8, j = 8, pps = 64)
    assert(coded.length < 256 * 3 / 4) // deltas are small: k-split engaged
  }

  test("8-bit NN: constant scanlines collapse to zero-block runs") {
    val px = Seq.fill(512)(37)
    val coded = roundtrip(px, NnMask, n = 8, j = 8, pps = 64)
    // per scanline: ref block FS (3+8+7 bits) + one zero-run (~9 bits)
    // = ~4 bytes x 8 scanlines; anything near raw means runs never fired
    assert(coded.length < 40)
  }

  test("8-bit NN: white noise falls back to wide k or no-compression") {
    val rnd = new scala.util.Random(7)
    val px = Seq.fill(512)(rnd.nextInt(256))
    val coded = roundtrip(px, NnMask, n = 8, j = 8, pps = 64)
    assert(coded.length >= 512 * 7 / 8) // incompressible stays ~raw
  }

  test("8-bit EC: no references, direct value coding") {
    val px = (0 until 128).map(i => i % 7) // small VALUES, not small deltas
    val coded = roundtrip(px, EcMask, n = 8, j = 16, pps = 32)
    assert(coded.length < 128 / 2)
  }

  test("second extension engages on near-zero pair data (EC)") {
    // values 0/1: per pair gamma <= 2, SE beats k=0 FS (J/2 codewords)
    val px = (0 until 256).map(i => if (i % 5 == 0) 1 else 0)
    val coded = roundtrip(px, EcMask, n = 8, j = 16, pps = 64)
    assert(coded.length < 40)
  }

  test("16-bit NN MSB: k above 7 reachable only via ALLOW_K13 ids") {
    val rnd = new scala.util.Random(11)
    var v = 30000
    val px = (0 until 256).map { _ => v += rnd.nextInt(4097) - 2048; v }
    roundtrip(px, NnMask, n = 16, j = 16, pps = 64)
  }

  test("16-bit NN LSB: little-endian pixel order round-trips") {
    val px = (0 until 128).map(i => 1000 + 17 * i)
    roundtrip(px, NnMask & ~Szip.MSB | Szip.LSB, n = 16, j = 8, pps = 32)
  }

  test("mapped residuals hit the asymmetric theta branches at the range edges") {
    // values hugging 0 and 255 force |delta| > theta on both sides
    val px = Seq(0, 255, 0, 254, 1, 255, 0, 200, 3, 255, 0, 128, 255, 0, 7, 250) ++
      Seq.fill(16)(0)
    roundtrip(px, NnMask, n = 8, j = 8, pps = 16)
  }

  test("32-bit NN: full-range unsigned values with a 5-bit ID space") {
    val rnd = new scala.util.Random(13)
    var v = 0x80000000L
    val px: Seq[Long] = (0 until 128).map { _ =>
      v = (v + rnd.nextInt(1 << 20) - (1 << 19)) & 0xFFFFFFFFL; v
    }
    roundtrip(px, NnMask, n = 32, j = 8, pps = 32)
  }

  test("32-bit NN: range-edge values exercise Long theta arithmetic") {
    val top = 0xFFFFFFFFL
    val px: Seq[Long] = Seq(0L, top, 0L, top - 1, 1L, top, 0L, top / 2,
      3L, top, 0L, 128L, top, 0L, 7L, top - 7) ++ Seq.fill(16)(0L)
    roundtrip(px, NnMask, n = 32, j = 8, pps = 16)
  }

  test("32-bit EC LSB: little-endian 4-byte pixels, direct value coding") {
    val px: Seq[Long] = (0 until 64).map(i => (i * 77L) % (1L << 24))
    roundtrip(px, EcMask & ~Szip.MSB | Szip.LSB, n = 32, j = 16, pps = 32)
  }

  test("generative round-trip over the parameter grid (seeded scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cfg = for {
      n    <- Gen.oneOf(4, 8, 12, 16, 32)
      j    <- Gen.oneOf(8, 16, 32)
      mult <- Gen.choose(1, 4)
      rows <- Gen.choose(1, 6)
      mode <- Gen.oneOf(Szip.NN, Szip.EC)
      order <- Gen.oneOf(Szip.MSB, Szip.LSB)
      shape <- Gen.oneOf("noise", "ramp", "sparse", "const")
    } yield (n, j, j * mult, rows, mode, order, shape)
    (0 until 120).flatMap(i =>
      cfg.apply(Gen.Parameters.default, Seed(i.toLong))).foreach {
      case (n, j, pps, rows, mode, order, shape) =>
        val mask = Szip.Raw | Szip.AllowK13 | mode | order
        val xmax = (1L << n) - 1
        val rnd = new scala.util.Random(n * 1000 + pps + rows)
        val px: Seq[Long] = (0 until pps * rows).map { i =>
          shape match {
            case "noise"  => (rnd.nextLong() & Long.MaxValue) % (xmax + 1)
            case "ramp"   => (i * 3L) % (xmax + 1)
            case "sparse" => if (i % 7 == 0) xmax else 0L
            case "const"  => xmax / 2
          }
        }
        roundtrip(px, mask, n, j, pps)
    }
  }

  test("remainder-of-segment zero runs (fs=4) decode to the 64-block segment end") {
    // the one decoder branch the cost-optimizing encoder never emits
    // (it always knows the exact run): hand-built streams, EC mode,
    // n=8 j=8 pps=512 -> exactly one 64-block segment per scanline
    class Bits {
      val buf = collection.mutable.ArrayBuffer.empty[Byte]
      var cur, nb = 0
      def put(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach { i =>
        cur = (cur << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
      }
      def fs(v: Int): Unit = { put(0, v); put(1, 1) }
      def bytes: Array[Byte] =
        (if (nb > 0) buf :+ (cur << (8 - nb)).toByte else buf).toArray
    }
    // whole-segment ROS: ID 000, zero-block bit, fs=4
    val whole = new Bits
    whole.put(0, 3); whole.put(0, 1); whole.fs(4)
    val out1 = Szip.decode(whole.bytes, EcMask, 8, 8, 512, 512)
    assert(out1.forall(_ == 0))
    // mid-segment ROS: one FS-coded block of ones, then ROS fills the
    // remaining 63 blocks with zeros
    val mid = new Bits
    mid.put(1, 3)                      // id=1: k=0 FS coding
    (0 until 8).foreach(_ => mid.fs(1)) // eight samples of value 1
    mid.put(0, 3); mid.put(0, 1); mid.fs(4)
    val out2 = Szip.decode(mid.bytes, EcMask, 8, 8, 512, 512)
    assert(out2.take(8).forall(_ == 1) && out2.drop(8).forall(_ == 0))
  }

  test("decoder fails fast by name on zero-block at a reference position") {
    // hand-build: scanline of 8, j=8, NN -> first block is the ref block;
    // ID 000 + 0 (zero-block) there is the unsupported combination
    val stream = Array[Byte](0x08, 0x00) // 000 0 1 ... : id=0, ext=0, fs=0
    val e = intercept[IllegalArgumentException] {
      Szip.decode(stream, NnMask, 8, 8, 8, 8)
    }
    assert(e.getMessage.contains("reference block"))
  }

  test("decoder fails fast by name on multi-segment scanlines") {
    // > 64 blocks per scanline: szlib's remainder-of-segment numbering
    // is unvalidated there, so the decoder rejects rather than risks a
    // silent in-bounds mis-decode (libhdf5 never configures such shapes)
    val e = intercept[IllegalArgumentException] {
      Szip.decode(new Array[Byte](16), EcMask, 8, 8, 8 * 65, 8 * 65)
    }
    assert(e.getMessage.contains("64-block"))
  }

  test("hdf5 payload carries the uncompressed size prefix") {
    val px = (0 until 64).map(i => i * 3 % 256)
    val raw = px.map(_.toByte).toArray
    val payload = SzipTestEncoder.encodeHdf5(raw, Seq(NnMask, 8, 8, 32))
    assert((payload(0) & 0xFF) == 64 && payload(1) == 0)
    val back = Szip.decodeHdf5(payload, Vector(NnMask, 8, 8, 32))
    assert(back.toSeq == raw.toSeq)
  }
}
