package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized mutation fuzz DIRECTLY over the szip chunk decoder (round-13
  * sweep #8, densifying `Hdf5FuzzSpec`'s coverage: inside the container a
  * mutation usually dies in the outer HDF5 checks before it ever reaches
  * the bit-level Rice machinery; here every mutant IS a szip payload).
  * Fixtures span the decoder's modes — NN and EC prediction, 8/16/32-bit
  * samples, zero-block runs (an all-zero stream), second-extension-heavy
  * lowentropy data, multi-scanline frames — plus fuzzed CLIENT DATA
  * (the cd quadruple a corrupt filter message would deliver). Contract
  * per mutant: terminate within a CPU budget, return bytes or refuse
  * with the named IllegalArgumentException.
  */
class SzipFuzzSpec extends AnyFunSuite {

  private def samples16(total: Int, f: Int => Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(total * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until total).foreach(i => bb.putShort(f(i).toShort))
    bb.array()
  }

  /** (name, stored payload incl. size prefix, cd client values). */
  private def targets(): Seq[(String, Array[Byte], Vector[Int])] = {
    val nnLsb16 = Vector(Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB, 16, 8, 16)
    val ec8 = Vector(Szip.Raw | Szip.AllowK13 | Szip.EC | Szip.LSB, 8, 8, 16)
    val nn32 = Vector(Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB, 32, 8, 16)
    def enc(raw: Array[Byte], cd: Vector[Int]) =
      SzipTestEncoder.encodeHdf5(raw, cd)
    Seq(
      ("nn16-sine", enc(samples16(64, i => 800 + (math.sin(i / 3.0) * 300).toInt),
        nnLsb16), nnLsb16),
      ("nn16-zeros", enc(new Array[Byte](128), nnLsb16), nnLsb16),
      ("ec8-ramp", enc(Array.tabulate(64)(i => (i % 251).toByte), ec8), ec8),
      ("nn32-steps", enc({
        val bb = java.nio.ByteBuffer.allocate(64 * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until 64).foreach(i => bb.putInt(i / 7 * 1000))
        bb.array()
      }, nn32), nn32))
  }

  private val Kinds = Vector("bitflip", "smear", "zero4", "fill4", "truncate")
  private val PerKind = 400

  private def mutant(base: Array[Byte], kind: String, i: Int): Array[Byte] = {
    val rnd = new scala.util.Random(0x521913L * (Kinds.indexOf(kind) + 1) + i)
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
        val at = rnd.nextInt(math.max(1, b.length - 4))
        java.util.Arrays.fill(b, at, math.min(b.length, at + 4), 0.toByte)
        b
      case "fill4" =>
        val at = rnd.nextInt(math.max(1, b.length - 4))
        java.util.Arrays.fill(b, at, math.min(b.length, at + 4), 0xFF.toByte)
        b
      case "truncate" =>
        java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length - 1))
    }
  }

  test("every szip payload mutant terminates and fails only by name") {
    val harness = new graft.testfs.FuzzHarness("szip-fuzz")
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    var ok = 0; var named = 0; var total = 0
    targets().foreach { case (fmt, base, cd) =>
      Szip.decodeHdf5(base, cd) // the un-mutated payload must decode
      for (kind <- Kinds; i <- 0 until PerKind) {
        total += 1
        val m = mutant(base, kind, i)
        harness.probe(() => { Szip.decodeHdf5(m, cd); () }) match {
          case Some(None) => ok += 1
          case Some(Some(_: IllegalArgumentException)) => named += 1
          case Some(Some(t)) =>
            violations += s"$fmt/$kind/$i: ${t.getClass.getName}: ${t.getMessage}"
          case None =>
            violations += s"$fmt/$kind/$i: HANG (>10s cpu)"
        }
      }
    }
    // and the CLIENT DATA itself: a corrupt filter message delivers an
    // arbitrary cd quadruple against a valid payload
    val (_, valid, baseCd) = targets().head
    val rnd = new scala.util.Random(0xCDCD13L)
    (0 until 500).foreach { i =>
      total += 1
      val cd = Vector.tabulate(4)(k =>
        if (rnd.nextInt(3) == 0) baseCd(k) else rnd.nextInt())
      harness.probe(() => { Szip.decodeHdf5(valid, cd); () }) match {
        case Some(None) => ok += 1
        case Some(Some(_: IllegalArgumentException)) => named += 1
        case Some(Some(t)) =>
          violations += s"cd/$i ($cd): ${t.getClass.getName}: ${t.getMessage}"
        case None => violations += s"cd/$i ($cd): HANG (>10s cpu)"
      }
    }
    harness.shutdown()
    info(s"$total mutants: $ok clean decodes, $named named refusals, ${violations.size} violations")
    assert(violations.isEmpty,
      s"${violations.size} contract violations (first 20):\n" +
        violations.take(20).mkString("\n"))
  }
}
