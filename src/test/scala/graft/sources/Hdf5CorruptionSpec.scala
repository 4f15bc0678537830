package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reader's hostile-input contract (round-12 latent sweep over
  * `sources/Hdf5.scala` / `Szip.scala` error paths): "anything outside the
  * subset fails fast WITH A MESSAGE, never misreads, never hangs".
  * Each case here was a real hole before the sweep:
  *
  *  - 64-bit addresses were narrowed with `toInt` before any bounds
  *    check, so a corrupt address like 0x1_0000_0010 landed IN RANGE at
  *    0x10 and silently misread live bytes;
  *  - `dims.product` wrapped on hostile dataspaces (2^32 × 2^32 → 0) and
  *    read an empty dataset without a word;
  *  - B-tree child pointers aiming back at an ancestor recursed forever;
  *  - a huge global-heap object size wrapped the 8-byte-aligned skip
  *    negative and cycled the cursor forever;
  *  - szip `pixels_per_scanline = 0` passed every modular `require`
  *    (0 % j == 0) and then `base += pps` never advanced — a hang;
  *  - a truncated szip stream crashed with a bare array index, not a
  *    named error.
  */
class Hdf5CorruptionSpec extends AnyFunSuite {

  private def validContainer(): Array[Byte] = {
    val w = new Hdf5TestWriter()
    val ds = w.dataset(Seq(2L, 3L), w.float64,
      Array.tabulate(6 * 8)(_.toByte))
    w.finish(w.group(Seq("d" -> ds)))
  }

  private def findSig(bytes: Array[Byte], sig: String, from: Int = 0): Int = {
    val pat = sig.getBytes("US-ASCII")
    var i = from
    while (i + pat.length <= bytes.length) {
      if (pat.indices.forall(k => bytes(i + k) == pat(k))) return i
      i += 1
    }
    fail(s"fixture has no '$sig' structure")
  }

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  test("a truncated container fails by name, not with a bare index crash") {
    val full = validContainer()
    // cut everything after the superblock: the root header address now
    // points past the end
    val ex = intercept[IllegalArgumentException] {
      Hdf5.open(java.util.Arrays.copyOf(full, 100))
    }
    assert(ex.getMessage.contains("HDF5"))
    // and a cut INSIDE the superblock itself
    val ex2 = intercept[IllegalArgumentException] {
      Hdf5.open(java.util.Arrays.copyOf(full, 12))
    }
    assert(ex2.getMessage.contains("HDF5"))
  }

  test("a 64-bit root address whose low half lands in range fails, never misreads") {
    val bytes = validContainer()
    val bb = le(bytes)
    // superblock v0 root symbol-table entry: link-name offset at 56,
    // root object header address at 64 — verify before patching
    val origRoot = bb.getLong(64)
    assert(origRoot > 0 && origRoot < bytes.length,
      s"fixture layout moved: offset 64 holds $origRoot")
    bb.putLong(64, 0x1_0000_0010L) // toInt would land at 0x10 — in range
    val ex = intercept[IllegalArgumentException] { Hdf5.open(bytes) }
    assert(ex.getMessage.contains("outside the container"))
  }

  test("a group B-tree whose child points back at itself fails as a cycle, not a hang") {
    val bytes = validContainer()
    val tree = findSig(bytes, "TREE")
    val bb = le(bytes)
    // TREE: sig(4) type(1) level(1) entries(2) siblings(16) key(8) child(8)
    assert(bb.get(tree + 4) == 0, "expected a group (type 0) B-tree node")
    bb.put(tree + 5, 1.toByte)           // claim an internal node…
    bb.putLong(tree + 32, tree.toLong)   // …whose child is itself
    val ex = intercept[IllegalArgumentException] { Hdf5.open(bytes) }
    assert(ex.getMessage.contains("cycle"))
  }

  test("a chunk B-tree whose child points back at itself fails as a cycle, not a hang") {
    val w = new Hdf5TestWriter()
    val raw = Array.tabulate(24 * 8)(_.toByte)
    val ds = w.chunkedDataset(Seq(4L, 6L), w.float64, raw, Seq(2, 3))
    val bytes = w.finish(w.group(Seq("d" -> ds)))
    // the chunk index is the B-tree node of TYPE 1 (the group tree is 0)
    var tree = findSig(bytes, "TREE")
    while (bytes(tree + 4) != 1) tree = findSig(bytes, "TREE", tree + 1)
    val bb = le(bytes)
    bb.put(tree + 5, 1.toByte) // internal node
    // type-1 key: size u32 + mask u32 + (rank+1)=3 offsets u64 → child at +56
    bb.putLong(tree + 56, tree.toLong)
    val d = Hdf5.open(bytes).datasets.head
    val ex = intercept[IllegalArgumentException] { d.readDoubles() }
    assert(ex.getMessage.contains("cycle"))
  }

  test("hostile dataspace dims that wrap the element product fail, never read empty") {
    // 2^32 × 2^32 elements: the unchecked product is exactly 0 — the old
    // reader returned a zero-byte "dataset" for it
    val buf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    val d = Hdf5.Dataset("evil", Vector(1L << 32, 1L << 32),
      Hdf5.Dtype(0, 8, signed = true), buf, 1, 0L, 0L, Vector.empty,
      Vector.empty)
    val ex = intercept[IllegalArgumentException] { d.readBytes() }
    assert(ex.getMessage.contains("overflow"))
  }

  test("a huge global-heap object size fails by name instead of cycling the cursor") {
    val w = new Hdf5TestWriter()
    val ds = w.vlenStringDataset(Seq("alpha", "beta"))
    val bytes = w.finish(w.group(Seq("s" -> ds)))
    val gcol = findSig(bytes, "GCOL")
    val bb = le(bytes)
    // first object header: idx(2) ref(2) reserved(4) at +16, size u64 at +24
    assert(bb.getShort(gcol + 16) == 1, "fixture layout moved: no object 1")
    bb.putLong(gcol + 24, 0x7FFF_FFFF_FFFF_FFF0L) // aligned skip wraps negative
    val d = Hdf5.open(bytes).datasets.head
    val ex = intercept[IllegalArgumentException] { d.readStrings() }
    assert(ex.getMessage.contains("exceeds collection"))
  }

  // ---- szip error paths ----

  test("szip: zero pixels-per-scanline is rejected, not an infinite loop") {
    val ex = intercept[IllegalArgumentException] {
      Szip.decode(Array[Byte](0), Szip.Raw | Szip.NN, 8, 4, 0, 8)
    }
    assert(ex.getMessage.contains("scanline"))
  }

  test("szip: a chunk payload shorter than the size prefix is rejected by name") {
    val ex = intercept[IllegalArgumentException] {
      Szip.decodeHdf5(Array[Byte](1, 2),
        Vector(Szip.Raw | Szip.NN, 8, 4, 8))
    }
    assert(ex.getMessage.contains("size prefix"))
  }

  test("szip: a negative uncompressed-size prefix is rejected by name") {
    val ex = intercept[IllegalArgumentException] {
      Szip.decode(Array[Byte](0, 0), Szip.Raw | Szip.NN, 8, 4, 8, -8)
    }
    assert(ex.getMessage.contains("negative"))
  }

  test("szip: a truncated coded stream fails by name, not a bare index crash") {
    val ex = intercept[IllegalArgumentException] {
      Szip.decode(Array.emptyByteArray, Szip.Raw | Szip.EC, 8, 4, 4, 4)
    }
    assert(ex.getMessage.contains("truncated"))
  }

  test("a zip-bomb chunk refuses by name before the heap feels it") {
    // 64 MB of zeros deflates to ~64 KB: a hostile chunk payload whose
    // VALID deflate stream dwarfs the 48-byte nominal chunk extent. The
    // random fuzz can't synthesize this (a mutated tiny stream stays
    // tiny) — only a crafted payload pins the inflate cap. Without it the
    // reader allocated the full bomb before copyChunk's extent check ran.
    val bomb = {
      val d = new java.util.zip.Deflater(9)
      d.setInput(new Array[Byte](64 * 1024 * 1024)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    assert(bomb.length < 256 * 1024, s"bomb stream is ${bomb.length} B")
    val w = new Hdf5TestWriter()
    val ds = w.chunkedDataset(Seq(2L, 3L), w.float64,
      Array.tabulate(48)(_.toByte), chunkDims = Seq(2, 3),
      packedOverride = Some(bomb))
    val d = Hdf5.open(w.finish(w.group(Seq("bomb" -> ds)))).datasets.head
    val ex = intercept[IllegalArgumentException](d.readBytes())
    assert(ex.getMessage.contains("inflates past"), ex.getMessage)
  }
}
