package graft.stream

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Run-the-claims sweep #10 over the r14 checkpoint hygiene (r15 verdict
  * task 3a + the concurrent-start window ADVICE named): `cleanCrashScratch`
  * may delete ONLY crash leftovers — never a file a healthy restart needs,
  * and never another query's in-flight write.
  */
class FileWatcherHygieneSpec extends SparkSpec {

  private def mkWatch(files: String*): java.nio.file.Path = {
    val w = java.nio.file.Files.createTempDirectory("graft-hygiene-watch")
    files.foreach(f =>
      java.nio.file.Files.write(w.resolve(f), s"bytes-$f".getBytes))
    w
  }

  private def drain(watch: String, ckpt: String): Unit = {
    val q = FileWatcher.start(
      FileWatcher.fileEvents(spark, watch, suffix = ".emd"),
      ckpt, drain = true) { (batch, _) => batch.count(); () }
    q.awaitTermination()
  }

  /** Recursive relative listing of regular files under `dir`. */
  private def listing(dir: java.nio.file.Path): Set[String] = {
    val s = java.nio.file.Files.walk(dir)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => dir.relativize(p).toString).toSet
    finally s.close()
  }

  test("cleanCrashScratch deletes ONLY dot-tmp orphans: a committed checkpoint restarts intact") {
    val watch = mkWatch("a.emd")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hygiene-ckpt")
    drain(watch.toString, ckpt.toString)
    val committedState = listing(ckpt)
    assert(committedState.exists(_.startsWith("commits/")), committedState)
    assert(committedState.exists(_.startsWith("offsets/")), committedState)

    // crash leftovers in every directory the hygiene sweeps — plus decoys
    // a over-broad pattern could hit: live metadata-log names are bare
    // digits or .compact files, never dot-prefixed AND .tmp-suffixed
    val orphans = Seq("offsets/.1.deadbeef.tmp", "commits/.1.cafef00d.tmp",
      ".0.feedbead.tmp", "sources/0/.0.0badf00d.tmp")
    orphans.foreach { rel =>
      java.nio.file.Files.write(ckpt.resolve(rel), "torn".getBytes)
    }

    // restart with one more file: batch 1 must run and commit
    java.nio.file.Files.write(watch.resolve("b.emd"), "bytes-b".getBytes)
    drain(watch.toString, ckpt.toString)
    val after = listing(ckpt)
    // every file the committed checkpoint held survives the hygiene
    committedState.foreach(f =>
      assert(after.contains(f), s"hygiene deleted live checkpoint file $f"))
    // every orphan is gone
    orphans.foreach(o =>
      assert(!after.contains(o), s"orphan $o survived the restart hygiene"))
    // and the restart made progress past the committed batch
    assert(after.contains("commits/1"), after.toSeq.sorted.mkString(", "))
  }

  test("a start() racing an ACTIVE query on the same checkpoint never deletes its in-flight scratch") {
    val watch = mkWatch("a.emd")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hygiene-race")
    // commit batch 0 first so later restarts exercise the non-empty path
    drain(watch.toString, ckpt.toString)

    val q1 = FileWatcher.start(
      FileWatcher.fileEvents(spark, watch.toString, suffix = ".emd"),
      ckpt.toString, drain = false) { (batch, _) => batch.count(); () }
    try {
      assert(q1.isActive)
      // q1's simulated in-flight metadata write
      val inFlight = ckpt.resolve("offsets/.9.inflight.tmp")
      java.nio.file.Files.write(inFlight, "mid-write".getBytes)
      // the racing start: before the guard, its cleanCrashScratch deleted
      // the winner's .tmp before Spark's one-active-query enforcement
      // (which only fires inside .start()) could reject it
      val q2 = FileWatcher.start(
        FileWatcher.fileEvents(spark, watch.toString, suffix = ".emd"),
        ckpt.toString, drain = false) { (batch, _) => batch.count(); () }
      assert(java.nio.file.Files.exists(inFlight),
        "the loser start() deleted the active query's in-flight scratch")
      q2.stop(); q2.awaitTermination()
      if (q1.isActive) { q1.stop(); q1.awaitTermination() }
      // with NO active query left, the next start treats the leftover as
      // the crash orphan it now is
      drain(watch.toString, ckpt.toString)
      assert(!java.nio.file.Files.exists(inFlight),
        "orphan survived a start with no active owner")
    } finally if (q1.isActive) q1.stop()
  }
}
