package graft.stream

import graft.SparkSpec
import graft.testfs.CrashFileSystem
import org.apache.hadoop.fs.Path

/** Crash-point fuzz of the exactly-once gate (SURVEY §2 A2/A3): the
  * engine checkpoint — offset log, file-source seen-log, dropDuplicates
  * state store, commit log — lives on a [[CrashFileSystem]] scheme, and a
  * simulated crash is induced at every checkpoint filesystem mutation of
  * a drain. The claim under test is the reference's `CheckPoint.seen`
  * contract re-expressed on Spark: a crash between a batch's side effects
  * and its checkpoint commit must RE-PROCESS the batch on restart — never
  * skip past a file whose batch did not commit — and a batch whose commit
  * DID land is never re-delivered.
  */
class FileWatcherCrashSpec extends SparkSpec {

  private def crashDir(prefix: String): String = {
    CrashFileSystem.register(spark)
    CrashFileSystem.Scheme + ":" +
      java.nio.file.Files.createTempDirectory(prefix)
  }

  /** One drain over `watch` with checkpoint `ckpt`; returns
    * (batchId → paths delivered to the batch function, crashed?).
    */
  private def drainOnce(watch: String,
      ckpt: String): (Map[Long, Set[String]], Option[Throwable]) = {
    val seen = scala.collection.concurrent.TrieMap[Long, Set[String]]()
    val crashed =
      try {
        val q = FileWatcher.start(
          FileWatcher.fileEvents(spark, watch, suffix = ".emd"),
          ckpt, drain = true) { (batch, id) =>
          val paths = batch.select("path").collect().map(_.getString(0)).toSet
          if (paths.nonEmpty) seen.updateWith(id)(
            prev => Some(prev.getOrElse(Set.empty) ++ paths))
          ()
        }
        q.awaitTermination()
        None
      } catch { case t: Throwable => Some(t) }
    (seen.toMap, crashed)
  }

  /** Batch ids with a commit-log entry at `ckpt` (the engine's "this
    * batch is done" marker). Reads never tick the fuse.
    */
  private def committed(ckpt: String): Set[Long] = {
    val fs = new Path(ckpt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(ckpt, "commits")
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption).toSet
  }

  private def schedule(n: Long): Seq[Long] = {
    val stride = math.max(1L, n / 32)
    (0L until n).filter(k => k < 10 || k >= n - 10 || k % stride == 0)
  }

  test("crash at every checkpoint mutation: uncommitted batches re-process on restart, committed ones never re-deliver") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      def mkWatch(): String = {
        val w = java.nio.file.Files.createTempDirectory("graft-fwcrash-watch")
        java.nio.file.Files.write(w.resolve("a.emd"), "bytes-a".getBytes)
        java.nio.file.Files.write(w.resolve("b.emd"), "bytes-b".getBytes)
        w.toString
      }
      val all = Set("a.emd", "b.emd")
      def names(paths: Set[String]): Set[String] =
        paths.map(p => p.substring(p.lastIndexOf('/') + 1))

      // probe: count checkpoint mutations of one clean drain
      val (probeWatch, probeCkpt) = (mkWatch(), crashDir("graft-fwcrash-probe"))
      CrashFileSystem.arm(Long.MaxValue)
      val (probeSeen, probeCrashed) = drainOnce(probeWatch, probeCkpt)
      val n = CrashFileSystem.disarm()
      assert(probeCrashed.isEmpty && n > 0,
        s"probe run failed or measured no mutations (n=$n): $probeCrashed")
      assert(names(probeSeen.values.flatten.toSet) == all)

      var tested = 0
      schedule(n).foreach { k =>
        val (watch, ckpt) = (mkWatch(), crashDir(s"graft-fwcrash-k$k"))
        CrashFileSystem.arm(k)
        val (run1, crashed) = drainOnce(watch, ckpt)
        CrashFileSystem.disarm()
        assert(crashed.nonEmpty, s"k=$k of $n: drain completed under the fuse")

        val done1 = committed(ckpt)
        val (run2, crashed2) = drainOnce(watch, ckpt)
        assert(crashed2.isEmpty, s"k=$k: restart crashed with the fuse off: ${crashed2.map(_.toString.take(400))}")

        // never skip: every batch the crash left uncommitted re-delivers
        // its full path set on restart
        run1.foreach { case (id, paths) =>
          if (!done1.contains(id))
            assert(paths.subsetOf(run2.values.flatten.toSet),
              s"k=$k: batch $id (uncommitted at crash) was skipped: " +
                s"$paths not in ${run2.values.flatten.toSet}")
        }
        // never re-deliver: a batch whose commit landed stays consumed
        run1.foreach { case (id, paths) =>
          if (done1.contains(id))
            assert(paths.intersect(run2.values.flatten.toSet).isEmpty,
              s"k=$k: committed batch $id re-delivered")
        }
        // no loss end-to-end: the two runs together covered every file
        assert(names(run1.values.flatten.toSet ++ run2.values.flatten.toSet)
          == all, s"k=$k: a file never reached the batch function")
        tested += 1
      }
      info(s"file-watcher checkpoint: $tested crash points over $n mutations held")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
