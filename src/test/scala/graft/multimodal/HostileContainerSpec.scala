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
}
