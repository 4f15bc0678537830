package graft.stream

import graft.SparkSpec
import java.nio.file.Files

/** Rate-limited simulator source (SURVEY §2 A12): glob selection, cycling
  * with unique destination names, storage-bounding cleanup, and feeding
  * the streaming watcher end to end.
  */
class SimulatorSpec extends SparkSpec {

  test("cycles glob matches with unique names; keeps files when asked") {
    val in = Files.createTempDirectory("sim-in")
    val out = Files.createTempDirectory("sim-out")
    Files.write(in.resolve("a.emd"), Array[Byte](1))
    Files.write(in.resolve("b.emd"), Array[Byte](2))
    Files.write(in.resolve("skip.txt"), Array[Byte](3))

    val copied = Simulator.run(in.toString, out.toString,
      intervalMs = 0, maxCopies = 5, deleteAfter = false)
    assert(copied.map(_.getFileName.toString) == Seq(
      "simulator-0-a.emd", "simulator-1-b.emd", "simulator-2-a.emd",
      "simulator-3-b.emd", "simulator-4-a.emd"))
    assert(copied.forall(Files.exists(_)))
    assert(Files.readAllBytes(copied.head).toSeq == Seq[Byte](1))
  }

  test("deleteAfter bounds storage like the reference cleanup") {
    val in = Files.createTempDirectory("sim-in2")
    val out = Files.createTempDirectory("sim-out2")
    Files.write(in.resolve("x.emd"), Array[Byte](7))
    Simulator.run(in.toString, out.toString,
      intervalMs = 0, maxCopies = 3, deleteAfter = true)
    val left = Files.list(out).count()
    assert(left == 0)
  }

  test("feeds the file watcher: arrivals become exactly-once events") {
    val in = Files.createTempDirectory("sim-in3")
    val watch = Files.createTempDirectory("sim-watch")
    val ckpt = Files.createTempDirectory("sim-ckpt")
    Files.write(in.resolve("e1.emd"), "payload-1".getBytes)
    Files.write(in.resolve("e2.emd"), "payload-2".getBytes)

    // produce 4 arrivals (cycling 2 inputs), keep them for the batch
    Simulator.run(in.toString, watch.toString,
      intervalMs = 0, maxCopies = 4, deleteAfter = false)

    val seen = scala.collection.mutable.Set[String]()
    val events = FileWatcher.fileEvents(spark, watch.toString)
    FileWatcher.start(events, ckpt.toString, drain = true) { (batch, _) =>
      batch.select("path").collect().foreach(r => seen += r.getString(0))
    }.awaitTermination()
    assert(seen.size == 4)
    assert(seen.forall(_.contains("simulator-")))
  }
}
