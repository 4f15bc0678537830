package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite

class DebugPerfSpec extends AnyFunSuite {
  test("m8-shaped timing") {
    def work(reps: Int): (Long, Long, Long) = {
      var tEncP = 0L; var tEncI = 0L; var tDec = 0L
      var id = 0L
      while (id < reps) {
        val w = ((id % 3) * 2 + 4).toInt
        val h = ((id % 2) * 2 + 4).toInt
        val n = (id % 4 + 2).toInt
        def frame(f: Int): Array[Byte] =
          Array.tabulate(w * h)(i => ((id * 7 + f * 31 + i * 13) % 256).toByte)
        val frames = Seq.tabulate(n)(frame)
        var t0 = System.nanoTime()
        val pcm = H264Encoder.encodeGray(frames, w, h,
          H264Encoder.Config(qp = 28, pcmEvery = 1))
        tEncI += System.nanoTime() - t0
        t0 = System.nanoTime()
        val lossy = H264Encoder.encodeGray(frames, w, h,
          H264Encoder.Config(qp = 30, pFrames = true))
        tEncP += System.nanoTime() - t0
        t0 = System.nanoTime()
        for (enc <- Seq(pcm, lossy)) {
          val sps = H264Decoder.parseSps(Nal.unescape(enc.sps, 1, enc.sps.length))
          val pps = H264Decoder.parsePps(Nal.unescape(enc.pps, 1, enc.pps.length))
          val session = new H264Decoder.Session(sps, pps)
          enc.samples.foreach(s => session.decodeSample(s, 4))
        }
        tDec += System.nanoTime() - t0
        id += 1
      }
      (tEncI / 1000000, tEncP / 1000000, tDec / 1000000)
    }
    work(300) // warmup
    val (i1, p1, d1) = work(1500)
    println(s"encI=${i1}ms encP=${p1}ms dec=${d1}ms  (1500 docs)")
  }
}
