package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 quiet-composite bench acceptance machinery: the committed
  * calib floor the gate derives from, and the publication rule (upper
  * median over quiet-gated samples, all-samples fallback flagged unquiet).
  * The contiguous-window rule stayed unsatisfiable for three rounds while
  * the r14 attempts ledger showed per-query quiet readings DO occur inside
  * contended runs — composite mode formalizes that as the fallback
  * acceptance shape (r15 verdict task 1).
  */
class BenchCompositeSpec extends AnyFunSuite {

  private def writeArtifact(dir: String, body: String): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "BENCH_local.json"), body)
    ()
  }

  test("committedCalibFloor is the fastest committed parallel probe") {
    val dir = java.nio.file.Files.createTempDirectory("bench-floor").toString
    // absent file: no floor — the caller must refuse composite mode
    assert(Bench.committedCalibFloor(dir, 32).isEmpty)
    // the committed r12 shape: parallel_s faster than every series slice
    writeArtifact(dir,
      """{"value":86.5,"calib":{"single_s":0.8491,"parallel_s":1.2039,""" +
        """"threads":32,"parallel_med":1.3425,""" +
        """"series":[1.3852,1.3112,1.4793,1.2498]},"queries":{}}""")
    assert(Bench.committedCalibFloor(dir, 32).contains(1.2039))
    // a series slice can be the floor too
    writeArtifact(dir,
      """{"calib":{"parallel_s":1.5,"threads":32,"series":[1.1,1.9]}}""")
    assert(Bench.committedCalibFloor(dir, 32).contains(1.1))
    // thread-count mismatch: a cross-thread-count probe is a different
    // workload — no floor, never a silently-wrong gate
    assert(Bench.committedCalibFloor(dir, 16).isEmpty)
    // malformed values drop individually; zero/negative probes never win
    writeArtifact(dir,
      """{"calib":{"parallel_s":notanumber,"threads":32,"series":[0,-1,2.5]}}""")
    assert(Bench.committedCalibFloor(dir, 32).contains(2.5))
    // no calib object / corrupt file: None, never a throw
    writeArtifact(dir, """{"value":86.5,"queries":{}}""")
    assert(Bench.committedCalibFloor(dir, 32).isEmpty)
    writeArtifact(dir, "not json")
    assert(Bench.committedCalibFloor(dir, 32).isEmpty)
    // the driver-round shape escapes its quotes inside a "tail" string —
    // the reader unescapes before matching (same contract as priorCalib)
    writeArtifact(dir,
      """{"tail":"{\"calib\":{\"parallel_s\":1.25,\"threads\":32,""" +
        """\"series\":[1.3,1.28]}}"}""")
    assert(Bench.committedCalibFloor(dir, 32).contains(1.25))
  }

  test("compositePublish gates the median onto quiet samples and flags unquiet") {
    // quiet samples exist and agree: the published stats ignore the
    // bracket-flagged contended ones
    val (med, mn, mx, unq) = Bench.compositePublish(
      Seq((9.0, false), (0.5, true), (0.55, true), (12.0, false), (0.6, true)))
    assert(med == 0.55 && mn == 0.5 && mx == 0.6 && !unq)
    // a fully quiet, self-consistent triple is the plain upper median —
    // the old contiguous rule's estimator exactly
    assert(Bench.compositePublish(
      Seq((0.50, true), (0.52, true), (0.55, true)))._1 == 0.52)
    // a single quiet sample publishes itself
    assert(Bench.compositePublish(Seq((8.0, false), (0.4, true))) ==
      ((0.4, 0.4, 0.4, false)))
    // NO quiet sample: all-samples median published AND flagged — a reader
    // can never mistake a contended reading for a gated one
    val (m2, n2, x2, u2) = Bench.compositePublish(
      Seq((3.0, false), (5.0, false), (4.0, false)))
    assert(m2 == 4.0 && n2 == 3.0 && x2 == 5.0 && u2)
    intercept[IllegalArgumentException](Bench.compositePublish(Seq.empty))
  }

  test("the self-consistency trim excludes mid-pass bursts the brackets missed") {
    // the first r15 composite run's failure mode: quiet brackets, sample
    // contended INSIDE the pass — the outlier must not set the median
    val (med, mn, mx, _) = Bench.compositePublish(
      Seq((0.50, true), (1.40, true), (0.54, true)))
    assert(med == 0.54, s"mid-pass burst contaminated the median: $med")
    // spread stays honest: min/max over ALL quiet samples, trim or not
    assert(mn == 0.50 && mx == 1.40)
    // samples WITHIN host noise of each other all count (the trim only
    // engages when samples disagree beyond CompositeTrimRatio)
    assert(Bench.compositePublish(
      Seq((0.50, true), (0.60, true), (0.58, true)))._1 == 0.58)
    assert(Bench.CompositeTrimRatio > 1.2 && Bench.CompositeTrimRatio < 1.5)
  }

  test("priorChase keeps sampling only while the committed prior is undemonstrated") {
    // best quiet sample far over the prior: chase (the bandwidth-steal
    // case — agreeing-but-inflated samples must not end the search)
    assert(Bench.priorChase(Some(1.30), Some(0.45)))
    // prior demonstrated (within the ratio): stop
    assert(!Bench.priorChase(Some(0.55), Some(0.45)))
    // micro-queries: ratio over the bar, absolute excess under the floor
    assert(!Bench.priorChase(Some(0.15), Some(0.05)))
    // no quiet sample yet / no prior / degenerate prior: the quiet-target
    // machinery owns scheduling, the chase stays silent
    assert(!Bench.priorChase(None, Some(0.45)))
    assert(!Bench.priorChase(Some(9.0), None))
    assert(!Bench.priorChase(Some(9.0), Some(0.0)))
  }

  test("memSlice measures a parallel stream-sum and is reusable") {
    // the bandwidth probe must return sane positive seconds and not
    // degrade across calls (the array is allocated once)
    val a = Bench.memSlice(4)
    val b = Bench.memSlice(4)
    assert(a > 0 && b > 0 && a < 30 && b < 30)
  }

  test("the quiet gate clears the committed artifact's own probe spread") {
    // sanity anchor for the 1.3 ratio: the committed r12 run's QUIET series
    // spread (max 1.4793 / min 1.2039 = 1.23) fits under the gate, so a
    // host as quiet as the accepted run gates every sample — while the r14
    // contended slices (4-18x the floor) all fail it
    assert(Bench.QuietGateRatio > 1.4793 / 1.2039)
    assert(Bench.QuietGateRatio * 1.2039 < 4.0 * 1.2039)
  }
}
