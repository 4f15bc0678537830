package graft.stream

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Rate-limited experiment simulator (SURVEY §2 A12) — the reference's
  * user-simulation source (/root/reference/picoprobe/simulator.py:26-41):
  * cycle the files matching a glob, copy each into the watched directory
  * under a unique `simulator-<ind>-<name>` so every arrival is a distinct
  * event, sleep the configured interval between copies, and unlink the
  * previous copy to bound storage.
  *
  * This is a test/demo *driver-side* source by design (one slow producer
  * feeding the watch dir); the scalable ingest path is the watcher's file
  * stream itself, which handles any arrival rate the storage can sustain.
  */
object Simulator {

  /** Copy `maxCopies` files (cycling the glob matches) into `outputDir`.
    * `intervalMs` sleeps between copies; `deleteAfter` mirrors the
    * reference's cleanup (each copy is removed after its interval, so the
    * interval must exceed the consumer's trigger latency). Returns the
    * destination paths in copy order.
    */
  def run(inputDir: String, outputDir: String, glob: String = "*.emd",
      intervalMs: Long = 10000, maxCopies: Int = Int.MaxValue,
      deleteAfter: Boolean = true): Seq[Path] = {
    val in = Paths.get(inputDir)
    val inputs: Seq[Path] = {
      val s = Files.newDirectoryStream(in, glob)
      try s.asScala.toSeq.sortBy(_.getFileName.toString) finally s.close()
    }
    require(inputs.nonEmpty, s"no files matching $glob in $inputDir")
    Files.createDirectories(Paths.get(outputDir))
    val copied = Seq.newBuilder[Path]
    var ind = 0
    while (ind < maxCopies) {
      val src = inputs(ind % inputs.size)
      val dst = Paths.get(outputDir, s"simulator-$ind-${src.getFileName}")
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      copied += dst
      if (intervalMs > 0) Thread.sleep(intervalMs)
      if (deleteAfter) Files.deleteIfExists(dst)
      ind += 1
    }
    copied.result()
  }

  /** Run on a daemon thread; returns a stop handle (interrupt + join). */
  def start(inputDir: String, outputDir: String, glob: String = "*.emd",
      intervalMs: Long = 10000, deleteAfter: Boolean = true): AutoCloseable = {
    val t = new Thread(() =>
      try run(inputDir, outputDir, glob, intervalMs, Int.MaxValue, deleteAfter)
      catch { case _: InterruptedException => () })
    t.setDaemon(true)
    t.setName("graft-simulator")
    t.start()
    () => { t.interrupt(); t.join(5000) }
  }
}
