package graft.sinks

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.testfs.CrashFileSystem

/** Crash-point fuzz of [[Artifacts.writeBatch]]'s pre-clean + write window
  * (r15 verdict task 2). The claim under test: a crash at ANY filesystem
  * mutation — including BETWEEN the batch-dir delete and the rewrite —
  * followed by the stream's at-least-once replay converges to exactly the
  * replay's artifact set. The replay deliberately carries FEWER rows than
  * the crashed attempt (the quarantine-retry shape: the poison file's rows
  * are gone), so the sweep pins orphan REMOVAL by absence: the artifact
  * derived from the dropped row must NOT exist afterward — the prior specs
  * asserted presence of survivors, never absence of the orphan.
  */
class WriteBatchCrashSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def crashDir(prefix: String): (String, java.nio.file.Path) = {
    CrashFileSystem.register(spark)
    val local = java.nio.file.Files.createTempDirectory(prefix)
    (CrashFileSystem.Scheme + ":" + local, local)
  }

  private def write(dir: String, names: Seq[String], tag: String): Unit =
    Artifacts.writeBatch(
      names.map(n => (n, s"$tag:$n".getBytes("UTF-8"))).toDS().repartition(1),
      dir, batchId = 5L)

  /** Recursive (name -> content) under the local batch dir. */
  private def onDisk(local: java.nio.file.Path): Map[String, String] = {
    val base = local.resolve("batch_id=5")
    if (!java.nio.file.Files.exists(base)) Map.empty
    else {
      val s = java.nio.file.Files.walk(base)
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => base.relativize(p).toString ->
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).toMap
      finally s.close()
    }
  }

  test("crash anywhere in pre-clean+write, then a smaller replay = exactly the replay's set") {
    // probe: count the mutations of attempt(2 files) THEN replay(1 file)
    // against a dirty dir — the worst-case window the sweep must cover
    val (probeDir, probeLocal) = crashDir("graft-wbatch-probe")
    CrashFileSystem.arm(Long.MaxValue)
    write(probeDir, Seq("a.png", "sub/b.png"), "attempt")
    val nAttempt = CrashFileSystem.disarm()
    CrashFileSystem.arm(Long.MaxValue)
    write(probeDir, Seq("a.png"), "replay")
    val nReplay = CrashFileSystem.disarm()
    val n = nAttempt + nReplay
    // both phases must tick the fuse, and the replay against a DIRTY dir
    // must carry at least pre-clean delete + create + rename — otherwise
    // the sweep below is not covering the window this spec exists for
    assert(nAttempt >= 4, s"attempt ticked only $nAttempt mutations")
    assert(nReplay >= 3, s"replay ticked only $nReplay mutations " +
      "(pre-clean delete + tmp create + rename expected)")
    assert(onDisk(probeLocal) == Map("a.png" -> "replay:a.png"),
      "clean attempt+replay must already converge")

    var tested = 0
    (0L until n).foreach { k =>
      val (dir, local) = crashDir(s"graft-wbatch-k$k")
      CrashFileSystem.arm(k)
      val crashed =
        try { write(dir, Seq("a.png", "sub/b.png"), "attempt")
              write(dir, Seq("a.png"), "replay"); false }
        catch { case _: Throwable => true }
      CrashFileSystem.disarm()
      assert(crashed, s"k=$k of $n: both writes completed under the fuse")
      // the at-least-once replay after the crash: fewer rows than the
      // crashed attempt (the quarantined file's artifact must vanish)
      write(dir, Seq("a.png"), "replay")
      val state = onDisk(local)
      assert(state == Map("a.png" -> "replay:a.png"),
        s"k=$k: expected exactly the replay's artifact, got $state")
      // duplicate delivery after success stays converged
      write(dir, Seq("a.png"), "replay")
      assert(onDisk(local) == Map("a.png" -> "replay:a.png"), s"k=$k dup")
      tested += 1
    }
    info(s"writeBatch: $tested crash points over $n mutations held")
  }
}
