package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the calib-baseline pairing contract of [[Bench.priorCalib]].
  *
  * The r10 structural defect: exact-round pairing (baseline =
  * BENCH_r{round} for the round of the newest CORRECTNESS artifact) can
  * never resolve in the DRIVER's flow, because the driver writes
  * CORRECTNESS_rN before the bench runs and BENCH_rN after — so every
  * driver artifact carried `normalized_total: null`. The contract is now
  * "newest BENCH_r{k} with k ≤ round carrying a parseable calib", which
  * pairs the driver flow to r{N-1} and the builder's in-round flow to rN,
  * both strictly before the current round.
  */
class BenchCalibSpec extends AnyFunSuite {

  private def withRepo(files: Map[String, String])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bench-calib-spec")
    try {
      files.foreach { case (name, txt) =>
        java.nio.file.Files.writeString(dir.resolve(name), txt)
      }
      f(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def benchJson(parallelS: Double, threads: Int): String =
    s"""{"metric":"total","value":100.0,"calib":{"single_s":0.5,"parallel_s":$parallelS,"threads":$threads,"parallel_med":$parallelS,"series":[]}}\n"""

  test("driver flow: CORRECTNESS_rN present, BENCH_rN absent pairs to BENCH_r{N-1}") {
    withRepo(Map(
      "CORRECTNESS_r11.json" -> """{"q1":{"rows_match":true}}""",
      "BENCH_r10.json" -> benchJson(1.25, 32),
      "BENCH_r09.json" -> benchJson(0.99, 32))) { repo =>
      val got = Bench.priorCalib(repo, 11)
      assert(got.contains(("BENCH_r10.json", 1.25, 32)))
    }
  }

  test("builder in-round flow: BENCH_rN present pairs to it, not an older round") {
    withRepo(Map(
      "BENCH_r10.json" -> benchJson(1.25, 32),
      "BENCH_r09.json" -> benchJson(0.99, 32))) { repo =>
      assert(Bench.priorCalib(repo, 10)
        .contains(("BENCH_r10.json", 1.25, 32)))
    }
  }

  test("never pairs to a FUTURE round's artifact") {
    withRepo(Map(
      "BENCH_r12.json" -> benchJson(2.0, 32),
      "BENCH_r10.json" -> benchJson(1.25, 32))) { repo =>
      assert(Bench.priorCalib(repo, 11)
        .contains(("BENCH_r10.json", 1.25, 32)))
    }
  }

  test("driver-style artifact with the calib inside an escaped tail string parses") {
    val tail = """{"tail":"{\"metric\":\"total\",\"calib\":{\"single_s\":0.5,\"parallel_s\":1.5,\"threads\":32}}"}"""
    withRepo(Map("BENCH_r10.json" -> tail)) { repo =>
      assert(Bench.priorCalib(repo, 11).contains(("BENCH_r10.json", 1.5, 32)))
    }
  }

  test("a calib-less newest round is skipped, not fatal (pre-r7 artifacts)") {
    withRepo(Map(
      "BENCH_r10.json" -> """{"metric":"total","value":100.0}""",
      "BENCH_r09.json" -> benchJson(0.99, 32))) { repo =>
      assert(Bench.priorCalib(repo, 11)
        .contains(("BENCH_r09.json", 0.99, 32)))
    }
  }

  test("thread count rides along for the caller's mismatch refusal") {
    withRepo(Map("BENCH_r10.json" -> benchJson(1.1, 16))) { repo =>
      assert(Bench.priorCalib(repo, 11).map(_._3).contains(16))
    }
  }

  test("no prior artifact at all yields None") {
    withRepo(Map.empty) { repo =>
      assert(Bench.priorCalib(repo, 11).isEmpty)
    }
  }

  test("a corrupt newest artifact REFUSES normalization instead of falling back") {
    // the file mentions a calib but truncation cut the object — silently
    // normalizing against the older r09 would be a surprising baseline
    withRepo(Map(
      "BENCH_r10.json" -> """{"metric":"total","calib":{"single_s":0.5,"paral""",
      "BENCH_r09.json" -> benchJson(0.99, 32))) { repo =>
      assert(Bench.priorCalib(repo, 11).isEmpty)
    }
  }

  test("zero-padding twins tie-break deterministically (name order, not fs order)") {
    withRepo(Map(
      "BENCH_r9.json" -> benchJson(1.5, 32),
      "BENCH_r09.json" -> benchJson(0.9, 32))) { repo =>
      assert(Bench.priorCalib(repo, 10)
        .contains(("BENCH_r09.json", 0.9, 32)))
    }
  }

  test("an over-Int-range digit run in a stray filename is ignored, not fatal") {
    withRepo(Map(
      "BENCH_r99999999999.json" -> benchJson(9.9, 32),
      "BENCH_r10.json" -> benchJson(1.25, 32))) { repo =>
      assert(Bench.priorCalib(repo, 11)
        .contains(("BENCH_r10.json", 1.25, 32)))
    }
  }
}
