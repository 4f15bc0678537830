package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Sweep #9 — run-the-claims over the round-13 additions themselves.
  *
  * Pins here: (1) `Merge.currentVersion`'s pointer-loss recovery is
  * MONOTONIC — after a merge committed version v, recovery never reports
  * a version below v, and never reports an UNCOMMITTED higher version
  * (a crashed merge's data dir without its commit evidence); (2)
  * `Catalog.publish` is safe under concurrent same-path publishers in one
  * JVM — the scratch-hygiene delete and the read-then-append anti-join
  * serialize per catalogPath instead of dropping each other's rows.
  */
class Sweep9Spec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("Merge: pointer loss after v1 recovers v1 — never v0, never an uncommitted v2") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep9-merge").toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "name"), Seq("id"))
    Merge.mergeInto(spark, dir, Seq((2L, "b")).toDF("id", "name"), Seq("id"))
    assert(Merge.currentVersion(dir).contains(1L))
    // the delete→rename window on a no-atomic-rename filesystem: the
    // pointer is gone, committed snapshots remain
    SnapshotIo.delete(s"$dir/_CURRENT")
    assert(Merge.currentVersion(dir).contains(1L),
      "recovery must find the greatest COMMITTED version, not reset history")
    // an uncommitted higher version (crashed merge: data files landed,
    // no _SUCCESS) must NOT be resurrected
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "v=2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "v=2", "part-0.parquet"),
      Array[Byte](1, 2, 3))
    assert(Merge.currentVersion(dir).contains(1L))
    // and the next merge continues history from the recovered version
    assert(Merge.mergeInto(spark, dir,
      Seq((3L, "c")).toDF("id", "name"), Seq("id")) == 2L)
    assert(Merge.read(spark, dir).count() == 3L)
  }

  test("BucketedMerge: manifest evidence outranks a stray _SUCCESS after pointer loss") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep9-bm").toString
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Seq("id"), nBuckets = 2)
    BucketedMerge.mergeInto(spark, dir,
      Seq((2L, "b2")).toDF("id", "name"), Seq("id"))
    SnapshotIo.delete(s"$dir/_CURRENT")
    assert(BucketedMerge.currentVersion(dir).contains(1L))
    // a crashed NEXT merge that wrote its data (with Spark's _SUCCESS)
    // but never committed its manifest must not be resurrected: without
    // manifest-2 its bucket map is unknowable
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "v=2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "v=2", "_SUCCESS"),
      Array.emptyByteArray)
    assert(BucketedMerge.currentVersion(dir).contains(1L),
      "manifest-before-pointer precedence: _SUCCESS alone is not commit evidence")
  }

  test("currentVersion is read-only: racing readers during a merge never observe a lower version than last committed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep9-race").toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "name"), Seq("id"))
    val floor = new java.util.concurrent.atomic.AtomicLong(0L)
    val violations = new java.util.concurrent.atomic.AtomicInteger
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get) {
        // a legal race must never CRASH a reader either: the first run of
        // this spec caught currentVersion throwing ChecksumException when
        // the read landed between LocalFileSystem's data-file and .crc
        // sidecar renames — fixed with bounded retry + evidence recovery
        try Merge.currentVersion(dir) match {
          case Some(v) => if (v < floor.get) violations.incrementAndGet()
          case None => violations.incrementAndGet() // table vanished?
        } catch { case _: Throwable => violations.incrementAndGet() }
        ()
      }
    })
    reader.start()
    try {
      (1 to 4).foreach { i =>
        val v = Merge.mergeInto(spark, dir,
          Seq((i.toLong + 10, s"x$i")).toDF("id", "name"), Seq("id"))
        floor.set(v)
      }
    } finally { stop.set(true); reader.join(10000) }
    assert(violations.get == 0,
      s"${violations.get} reads observed a version below the committed floor")
  }

  test("Catalog.publish: concurrent same-path publishers lose no rows") {
    val cat = java.nio.file.Files.createTempDirectory("graft-sweep9-pub").toString
    def docs(paths: Seq[String]): DataFrame =
      paths.toDF("path")
        .withColumn("content", lit("bytes"))
        .withColumn("metadata_json", lit("{}"))
        .repartition(1)
        .transform(Catalog.dataciteDoc(_))
    // two "streams" sharing one catalog: disjoint subject sets, published
    // from two threads at once — without per-path serialization one
    // publish's scratch-hygiene delete races the other's committer
    val a = (1 to 8).map(i => s"/a/f$i.emd")
    val b = (1 to 8).map(i => s"/b/f$i.emd")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(a, b).map(paths => new Thread(() =>
      try Catalog.publish(spark, docs(paths), cat)
      catch { case t: Throwable => errs.add(t); () }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"publish threw: ${errs.peek()}")
    val subs = spark.read.parquet(cat).select("subject").collect()
      .map(_.getString(0)).toSeq
    assert(subs.length == 16 && subs.distinct.length == 16,
      s"expected 16 unique subjects, got ${subs.length} (${subs.distinct.length} distinct)")
  }
}
