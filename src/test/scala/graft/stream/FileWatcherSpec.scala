package graft.stream

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}

/** Streaming ingest tests (FIXTURES F6): suffix filter, exactly-once per
  * path, seen-set survival across restarts (same checkpoint), and the
  * end-to-end watch→catalog pipeline.
  */
class FileWatcherSpec extends SparkSpec {

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes("UTF-8"))

  test("fileEvents: suffix filter + exactly-once + checkpoint restart") {
    val watch = Files.createTempDirectory("graft-watch")
    val base = Files.createTempDirectory("graft-stream")
    val checkpoint = base.resolve("ckpt").toString
    val out = base.resolve("out").toString

    write(watch, "a.emd", "payload-a")
    write(watch, "b.txt", "not-matching")

    def drainOnce(): Unit = {
      val q = FileWatcher.start(
        FileWatcher.fileEvents(spark, watch.toString), checkpoint, drain = true) {
        (batch, _) =>
          if (!batch.isEmpty) batch.select("path", "experiment_id", "length")
            .write.mode("append").parquet(out)
      }
      q.awaitTermination()
    }

    drainOnce()
    val first = spark.read.parquet(out).collect()
    assert(first.length == 1)
    assert(first(0).getAs[String]("experiment_id") == "a")

    // restart with the same checkpoint: a.emd already seen, only c.emd new
    write(watch, "c.emd", "payload-c")
    drainOnce()
    val second = spark.read.parquet(out).collect()
    assert(second.length == 2)
    assert(second.map(_.getAs[String]("experiment_id")).toSet == Set("a", "c"))
  }

  test("ingestToCatalog: end-to-end watch -> DataCite catalog, idempotent") {
    val watch = Files.createTempDirectory("graft-watch2")
    val base = Files.createTempDirectory("graft-stream2")
    val catalog = base.resolve("catalog").toString

    write(watch, "x.emd", "abc")
    FileWatcher.ingestToCatalog(spark, watch.toString, catalog,
      base.resolve("ckpt").toString, drain = true).awaitTermination()

    val docs = spark.read.parquet(catalog).collect()
    assert(docs.length == 1)
    val d = docs(0)
    assert(d.getAs[String]("subject").endsWith("/x.emd"))
    val files = d.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("files")
    assert(files.head.getAs[String]("sha256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")

    // second drain with a fresh stream checkpoint but same catalog:
    // publish-level dedup keeps the catalog idempotent on subject
    FileWatcher.ingestToCatalog(spark, watch.toString, catalog,
      base.resolve("ckpt2").toString, drain = true).awaitTermination()
    assert(spark.read.parquet(catalog).count() == 1)
  }
}
