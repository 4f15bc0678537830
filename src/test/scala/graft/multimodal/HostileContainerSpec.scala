package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 latent-sweep findings on container dispatch: hostile
  * RIFF/ISO-BMFF structures must refuse BY NAME — before the sweep, a
  * negative RIFF chunk size walked `pos += 8 + size` BACKWARDS in both
  * `parseAvi` and `decodeWav` (an infinite loop, not an error), an AVI
  * frame extent past EOF was silently ZERO-PADDED by `copyOfRange` at
  * decode time (fabricated pixels), and a hostile ctts run count drove a
  * multi-GiB allocation before the arity check could refuse.
  */
class HostileContainerSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def riff(form: String, chunks: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
      form.getBytes("US-ASCII") ++ chunks

  test("parseAvi: a negative chunk size fails by name instead of looping forever") {
    val bytes = riff("AVI ",
      "JUNK".getBytes("US-ASCII") ++ le32(-9) ++ new Array[Byte](16))
    val ex = intercept[IllegalArgumentException] { Codec.parseAvi(bytes) }
    assert(ex.getMessage.contains("outside the file"))
  }

  test("parseAvi: a frame extent past EOF fails at parse, never zero-pads at decode") {
    val movi = "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(1024) ++ new Array[Byte](4)
    val bytes = riff("AVI ",
      "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi)
    val ex = intercept[IllegalArgumentException] { Codec.parseAvi(bytes) }
    assert(ex.getMessage.contains("outside the file"))
  }

  test("decodeWav: a negative chunk size fails by name instead of looping forever") {
    val bytes = riff("WAVE",
      "LIST".getBytes("US-ASCII") ++ le32(-12) ++ new Array[Byte](16))
    val ex = intercept[IllegalArgumentException] { Codec.decodeWav(bytes) }
    assert(ex.getMessage.contains("outside the file"))
  }

  test("decodeWav: a data chunk overrunning the file fails by name") {
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++
      Array[Byte](2, 0, 16, 0)
    val data = "data".getBytes("US-ASCII") ++ le32(4096) ++ new Array[Byte](4)
    val ex = intercept[IllegalArgumentException] {
      Codec.decodeWav(riff("WAVE", fmt ++ data))
    }
    assert(ex.getMessage.contains("outside the file"))
  }

  test("decodeWav: an undersized fmt chunk fails by name, not with a stray read") {
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(4) ++ Array[Byte](1, 0, 1, 0)
    val ex = intercept[IllegalArgumentException] {
      Codec.decodeWav(riff("WAVE", fmt))
    }
    assert(ex.getMessage.contains("too short"))
  }

  // --- round-13 sweep #7: ISO-BMFF + image decode, run-the-claims ---

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def bmffBox(typ: String, body: Array[Byte]): Array[Byte] =
    be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body

  test("parseMp4: a truncated stsd refuses by name, not with a raw index error") {
    // stsd CLAIMS 24 bytes but the file ends 13 bytes into its body:
    // version/flags + entry_count=1 + entry size + ONE byte of the entry
    // type. `fourcc` then reads the 4-byte type past EOF — before the
    // fix, `new String(bytes, off, 4)` threw StringIndexOutOfBounds,
    // which the refuse-by-name catch (ArrayIndexOutOfBounds only) missed.
    val stsdBody = Array[Byte](0, 0, 0, 0) ++ be32(1) ++ be32(100) ++
      Array[Byte]('a'.toByte)
    val stsdTrunc = be32(24) ++ "stsd".getBytes("US-ASCII") ++ stsdBody
    val mp4 = bmffBox("ftyp", new Array[Byte](8)) ++
      bmffBox("moov", bmffBox("trak", bmffBox("mdia",
        bmffBox("minf", bmffBox("stbl", stsdTrunc)))))
    val ex = intercept[IllegalArgumentException] { Codec.parseMp4(mp4) }
    assert(ex.getMessage.contains("corrupt ISO-BMFF"))
  }

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII"))
    crc.update(data)
    be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++
      be32(crc.getValue.toInt)
  }

  test("decodeImage: a PNG truncated inside its header refuses by name") {
    // valid signature dispatches to the JDK PNG reader, which then hits
    // EOF mid-IHDR — before the fix that escaped as a raw IIOException
    // instead of the refuse-by-name contract every other decoder keeps
    val bytes = pngSig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      Array[Byte](0, 0)
    val ex = intercept[IllegalArgumentException] { Codec.decodeImage(bytes) }
    assert(ex.getMessage.contains("corrupt image"))
  }

  test("decodeImage: a PNG with corrupt compressed data refuses by name") {
    // header parses (8x8 RGB) but the IDAT stream is zlib garbage — the
    // decode itself must refuse by name, not leak the reader's IOException
    val ihdr = be32(8) ++ be32(8) ++ Array[Byte](8, 2, 0, 0, 0)
    val bytes = pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", Array[Byte](0x55, 0x55, 0x55, 0x55)) ++
      pngChunk("IEND", Array.emptyByteArray)
    val ex = intercept[IllegalArgumentException] { Codec.decodeImage(bytes) }
    assert(ex.getMessage.contains("corrupt image"))
  }

  test("decodeImage: a hostile header claiming 50000x50000 refuses BEFORE allocating") {
    // 50000x50000 RGB is a 7.5 GB decode target — the pixel budget must
    // reject it from the header alone (the fixture carries no pixel
    // data, so reaching the allocation would fail differently)
    val ihdr = be32(50000) ++ be32(50000) ++ Array[Byte](8, 2, 0, 0, 0)
    val bytes = pngSig ++ pngChunk("IHDR", ihdr)
    val ex = intercept[IllegalArgumentException] { Codec.decodeImage(bytes) }
    assert(ex.getMessage.contains("pixel budget"))
  }

  test("decodeImage: undecodable bytes keep the existing by-name refusal") {
    val ex = intercept[IllegalArgumentException] {
      Codec.decodeImage("not an image at all".getBytes("US-ASCII"))
    }
    assert(ex.getMessage.contains("not a decodable image"))
  }
}
