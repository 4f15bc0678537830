package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized seeded mutation fuzz over the HDF5 reader (round-13 latent
  * sweep #8). `Hdf5CorruptionSpec` pins CRAFTED attacks — each a hole a
  * human found by reading the error paths. This spec walks the space the
  * crafting missed: thousands of random single-bit flips, byte smears,
  * window zero/fill overwrites, and truncations of one rich valid
  * container (contiguous f64 + chunked shuffle→deflate i32 + vlen strings
  * + compact u16 + a v4-indexed dataset), asserting the reader's
  * documented hostile-input contract on every mutant:
  *
  *   - it terminates within a bound (no hang, no unbounded cursor walk);
  *   - it either reads successfully or fails BY NAME — the reader's own
  *     `IllegalArgumentException` — never a raw JVM error
  *     (ArrayIndexOutOfBounds, BufferUnderflow, NegativeArraySize,
  *     DataFormatException out of `Inflater`, StackOverflow, …).
  *
  * Misreads (a mutant that decodes to wrong values without an error) are
  * out of scope here — a random mutation can produce a different but
  * valid file, so only the crafted spec can pin those.
  *
  * Determinism: one fixed seed per run; a failure message carries the
  * (kind, index) pair, and `mutant(kind, index)` regenerates the exact
  * input for a debugger.
  */
class Hdf5FuzzSpec extends AnyFunSuite {

  private[sources] def fixture(): Array[Byte] = {
    val w = new Hdf5TestWriter()
    val flat = w.dataset(Seq(4L, 5L), w.float64,
      Array.tabulate(4 * 5 * 8)(i => ((i * 13) % 251).toByte))
    val chunked = w.chunkedDataset(Seq(8L, 6L), w.int32,
      Array.tabulate(8 * 6 * 4)(i => ((i * 7) % 253).toByte),
      chunkDims = Seq(4, 3), deflateLevel = 6, shuffle = true)
    val strings = w.vlenStringDataset(Seq("alpha", "beta", "gamma-delta"))
    val compact = w.compactDataset(Seq(3L), w.uint16,
      Array.tabulate(6)(i => (i + 1).toByte))
    val v4 = w.chunkedDatasetV4(Seq(6L, 4L), w.float32,
      Array.tabulate(6 * 4 * 4)(i => ((i * 11) % 127).toByte),
      chunkDims = Seq(3, 4), index = "fixedarray", deflateLevel = 4)
    val szipRaw = java.nio.ByteBuffer.allocate(10 * 12 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 120).foreach(i =>
      szipRaw.putShort((800 + (math.sin(i / 3.0) * 300).toInt).toShort))
    val szip = w.chunkedDataset(Seq(10L, 12L), w.uint16, szipRaw.array(),
      chunkDims = Seq(4, 8), szip = Some(Seq(
        Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB, 16, 8, 8)))
    w.finish(w.group(Seq(
      "flat" -> flat, "chunked" -> chunked, "strings" -> strings,
      "compact" -> compact, "v4" -> v4, "szip" -> szip)))
  }

  /** Full decode: open and materialize every dataset by its type. */
  private[sources] def readAll(bytes: Array[Byte]): Unit = {
    def walk(g: Hdf5.Group): Unit = {
      g.datasets.foreach { d =>
        if (d.dtype.clazz == 3 || (d.dtype.clazz == 9 && d.dtype.base.isEmpty))
          d.readStrings()
        else if (d.dtype.clazz == 9) d.readVlenSeqs()
        else d.readBytes()
      }
      g.groups.foreach(walk)
    }
    walk(Hdf5.open(bytes))
  }

  private val Kinds = Vector("bitflip", "smear", "zero4", "fill4", "truncate")
  private val PerKind = 600

  /** Deterministic mutant (kind, i) of the fixture. */
  private[sources] def mutant(base: Array[Byte], kind: String, i: Int): Array[Byte] = {
    val rnd = new scala.util.Random(0xA1B2C3L * (Kinds.indexOf(kind) + 1) + i)
    val b = base.clone()
    kind match {
      case "bitflip" =>
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        b
      case "smear" =>
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        b
      case "zero4" =>
        val at = rnd.nextInt(b.length - 4)
        java.util.Arrays.fill(b, at, at + 4, 0.toByte)
        b
      case "fill4" =>
        val at = rnd.nextInt(b.length - 4)
        java.util.Arrays.fill(b, at, at + 4, 0xFF.toByte)
        b
      case "truncate" =>
        java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length - 1))
    }
  }

  test("every random mutant terminates and fails only by name") {
    val base = fixture()
    readAll(base) // the un-mutated fixture must decode

    // CPU-time-bounded probes (graft.testfs.FuzzHarness): a hang finding
    // means the decoder actually BURNED 10 s of CPU, not that a loaded
    // host starved a healthy probe of wall-clock
    val harness = new graft.testfs.FuzzHarness("hdf5-fuzz")
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    var ok = 0; var named = 0
    for (kind <- Kinds; i <- 0 until PerKind) {
      val m = mutant(base, kind, i)
      harness.probe(() => readAll(m)) match {
        case Some(None) => ok += 1
        case Some(Some(_: IllegalArgumentException)) => named += 1
        case Some(Some(t)) =>
          violations += s"$kind/$i: ${t.getClass.getName}: ${t.getMessage}"
        case None =>
          violations += s"$kind/$i: HANG (>10s cpu)"
      }
    }
    harness.shutdown()
    info(s"${Kinds.size * PerKind} mutants: $ok clean reads, $named named rejections, ${violations.size} violations")
    assert(violations.isEmpty,
      s"${violations.size} contract violations (first 20):\n" +
        violations.take(20).mkString("\n"))
  }
}
