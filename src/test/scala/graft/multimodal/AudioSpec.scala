package graft.multimodal

import graft.SparkSpec
import graft.sinks.Artifacts

/** WAV encode/decode + framing: bit-exact PCM round-trip, RIFF chunk
  * walking past foreign chunks, fail-fast on unsupported formats, and
  * known frame-feature values.
  */
class AudioSpec extends SparkSpec {

  private val samples: Array[Short] =
    Array.tabulate(100)(i => ((i * 7919) % 65536 - 32768).toShort)

  test("WAV round-trip is bit-exact") {
    val bytes = Artifacts.pcmWav(44100, samples)
    val (rate, got) = Codec.decodeWav(bytes)
    assert(rate == 44100)
    assert(got.toSeq == samples.toSeq)
  }

  test("decoder walks past foreign RIFF chunks (LIST before fmt)") {
    val canonical = Artifacts.pcmWav(8000, samples)
    // splice a LIST chunk between WAVE and fmt, patching the RIFF size
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = canonical.take(12) ++ junk ++ canonical.drop(12)
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xFF).toByte
    spliced(5) = ((riffSize >> 8) & 0xFF).toByte
    spliced(6) = ((riffSize >> 16) & 0xFF).toByte
    spliced(7) = ((riffSize >> 24) & 0xFF).toByte
    val (rate, got) = Codec.decodeWav(spliced)
    assert(rate == 8000 && got.toSeq == samples.toSeq)
  }

  test("decoder fails fast on non-PCM / stereo / 8-bit") {
    val bytes = Artifacts.pcmWav(8000, samples)
    def patched(off: Int, v: Short): Array[Byte] = {
      val b = bytes.clone()
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte; b
    }
    // fmt chunk payload starts at 20: format@20, channels@22, bits@34
    intercept[IllegalArgumentException](Codec.decodeWav(patched(20, 3)))
    intercept[IllegalArgumentException](Codec.decodeWav(patched(22, 2)))
    intercept[IllegalArgumentException](Codec.decodeWav(patched(34, 8)))
    intercept[IllegalArgumentException](Codec.decodeWav("nope".getBytes))
  }

  test("frame features: known energy and crossing counts") {
    val session = spark
    import session.implicits._
    val media = Seq(
      Media(1L, "audio",
        Artifacts.pcmWav(8000, Array[Short](3, -2, 2, 1, -1, 4)),
        MediaMeta(0, 0, 1, 8000, 6, "wav"))).toDS()
    val frames = Multimodal.audioFrames(Multimodal.decodeAudio(media), frameLen = 4)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 2)
    // frame 0: [3,-2,2,1] energy 9+4+4+1=18, crossings at (3,-2),(-2,2) = 2
    assert(frames(0).n == 4 && frames(0).energy == 18L && frames(0).crossings == 2L)
    // frame 1: [-1,4] energy 1+16=17, crossing at (-1,4) = 1
    assert(frames(1).n == 2 && frames(1).energy == 17L && frames(1).crossings == 1L)
  }

  test("m6 VAD: segment bookkeeping is consistent and envelope splits docs") {
    val rows = MultimodalQueries.m6AudioVad.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nFrames, voiced, nSeg, maxSeg) =>
      assert(voiced <= nFrames)
      assert(maxSeg <= voiced)
      assert((nSeg == 0) == (voiced == 0))
      assert(nSeg <= voiced) // each segment has >= 1 frame
    }
    // the planted quiet-block envelope must actually split speech into
    // multiple segments for a healthy share of clips
    assert(rows.count(_._4 >= 2) > rows.length / 4)
    // and some frames must be quiet (threshold is doing work)
    assert(rows.map(r => r._2 - r._3).sum > 0)
  }
}
