package graft.core

import graft.SparkSpec
import graft.catalog.{BucketedMerge, Merge}
import graft.sinks.Artifacts
import graft.stream.StreamingDedup
import graft.testfs.MockClusterFileSystem
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The r12 cluster-FS fix family (SnapshotIo sidecars, streaming ledgers,
  * executor-side artifact writes) verified against a filesystem whose
  * scheme is NOT the local default — the configuration that masked the
  * original bugs: every prior test ran on `file://`, where a java.nio
  * probe or a bare executor Configuration happens to resolve the same
  * bytes. Under `graftmock:` ([[graft.testfs.MockClusterFileSystem]])
  * those shortcuts fail loudly, so each test here FAILS if its subject is
  * reverted to java.nio / bare-Configuration I/O and passes at HEAD.
  */
class ClusterFsSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def mockDir(prefix: String): String = {
    MockClusterFileSystem.register(spark)
    MockClusterFileSystem.Scheme + ":" +
      java.nio.file.Files.createTempDirectory(prefix)
  }

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // The discriminating-power guard: if the scheme ever became resolvable
  // without the session conf (impl leaking into core-site, or a cached
  // instance served to a bare Configuration), every test below would pass
  // even against the reverted bugs. Pin that it cannot.
  test("graftmock is invisible to a bare Configuration and to java.nio") {
    MockClusterFileSystem.register(spark)
    intercept[java.io.IOException] {
      new Path("graftmock:/nowhere")
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
    }
    // java.nio reads the path as a RELATIVE file named "graftmock:…"
    assert(!new java.io.File("graftmock:/nowhere").isAbsolute)
  }

  test("Merge lifecycle (two merges + time travel + vacuum) on a non-default scheme") {
    val dir = mockDir("graft-clusterfs-merge")
    assert(Merge.mergeInto(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Seq("id")) == 0L)
    // the second merge must SEE v=0 — the r12 bug read the pointer via
    // java.nio, reported "never written", and reset history
    assert(Merge.mergeInto(spark, dir,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "name"), Seq("id")) == 1L)
    val rows = Merge.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(Merge.readVersion(spark, dir, 0L).count() == 2L)
    // vacuum must actually delete through the scheme (java.nio no-opped)
    Merge.vacuum(dir, keep = 1)
    assert(!fsOf(dir).exists(new Path(s"$dir/v=0")))
    assert(intercept[IllegalArgumentException](
      Merge.readVersion(spark, dir, 0L)).getMessage.contains("not present"))
    assert(Merge.read(spark, dir).count() == 3L)
    // the pointer swap itself landed on the mock scheme (FileContext has
    // no graftmock binding — this exercised the FileSystem fallback)
    assert(fsOf(dir).exists(new Path(s"$dir/_CURRENT")))
  }

  test("BucketedMerge merge + incremental scan + vacuum on a non-default scheme") {
    val dir = mockDir("graft-clusterfs-bmerge")
    assert(BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
      Seq("id"), nBuckets = 4) == 0L)
    assert(BucketedMerge.mergeInto(spark, dir,
      Seq((2L, "b2")).toDF("id", "name"), Seq("id")) == 1L)
    val rows = BucketedMerge.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    val (changed, df) = BucketedMerge.readChanged(spark, dir, 0L, 1L)
    assert(changed.nonEmpty && df.get.count() >= 1L)
    // manifests resolve through the scheme for vacuum's reference walk
    BucketedMerge.vacuum(dir, keep = 1)
    assert(BucketedMerge.read(spark, dir).count() == 3L)
  }

  test("StreamingDedup ledger replay blocks duplicates across batches on a non-default scheme") {
    val ledgerDir = mockDir("graft-clusterfs-ledger")
    val outDir = mockDir("graft-clusterfs-out")
    val ckpt = mockDir("graft-clusterfs-ckpt")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.firstSeenSink(
      in.toDF().toDF("doc_id", "text"), "text", ledgerDir, outDir, ckpt)
    try {
      in.addData((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      // "beta" re-arrives in a LATER batch: only the persisted ledger can
      // block it — the r12 bug probed the ledger dir with java.io.File,
      // read a cluster-FS ledger as absent, and re-admitted every
      // duplicate
      in.addData((3L, "beta"), (4L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3L)
    assert(out.select("text").as[String].collect().sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))
    assert(spark.read.parquet(ledgerDir).select("content_key")
      .distinct().count() == 3L)
  }

  test("Quarantine records land on a non-default scheme and replay stays converged") {
    import org.apache.spark.sql.functions.{col, udf}
    val qDir = mockDir("graft-clusterfs-quarantine")
    val files = Seq(("/land/poison.emd", 0L), ("/land/good.emd", 1L))
      .toDF("path", "payload").repartition(1)
    val parse: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        val fn = udf((p: String, v: Long) => {
          require(p != "/land/poison.emd", s"poison file: $p")
          v * 2
        })
        df.select(col("path"), fn(col("path"), col("payload")).as("parsed"))
      }
    def runBatch(): Unit =
      graft.pipelines.Quarantine.run(spark, files, parse, qDir, batchId = 5L) {
        g => parse(g).write.format("noop").mode("overwrite").save()
      }
    runBatch()
    // the record resolved through the scheme (a java.nio write would have
    // landed on a local relative path and this read would find nothing)
    val rows = spark.read.parquet(qDir).select("path", "batch_id").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "/land/poison.emd")
    // at-least-once replay through the same scheme: still exactly one row
    runBatch()
    assert(spark.read.parquet(qDir).count() == 1L)
  }

  test("Catalog.publish (anti-join + scratch hygiene) works on a non-default scheme") {
    import org.apache.spark.sql.functions.lit
    val cat = mockDir("graft-clusterfs-catalog")
    def docs(paths: String*): org.apache.spark.sql.DataFrame =
      paths.toSeq.toDF("path")
        .withColumn("content", lit("bytes"))
        .withColumn("metadata_json", lit("{}"))
        .repartition(1)
        .transform(graft.catalog.Catalog.dataciteDoc(_))
    graft.catalog.Catalog.publish(spark, docs("/d/a.emd", "/d/b.emd"), cat)
    // second publish: the committed-data probe, the existing-subjects
    // anti-join, and the _temporary hygiene delete must ALL resolve
    // through the scheme — a java.nio probe would read the catalog as
    // never-written and duplicate every subject
    graft.catalog.Catalog.publish(spark, docs("/d/b.emd", "/d/c.emd"), cat)
    val subs = spark.read.parquet(cat).select("subject").collect()
      .map(_.getString(0)).toSeq.sorted
    assert(subs == Seq("globus:///d/a.emd", "globus:///d/b.emd",
      "globus:///d/c.emd"))
  }

  test("Artifacts.writeFiles lands executor-written artifacts on a non-default scheme") {
    val dir = mockDir("graft-clusterfs-artifacts")
    val arts = Seq(
      ("maps/e1.png", Array[Byte](1, 2, 3)),
      ("e2.bin", Array[Byte](9, 8, 7, 6))).toDS().repartition(2)
    // the closure runs on executor threads with NO active session: only
    // the shipped driver conf knows fs.graftmock.impl — a bare executor
    // Configuration() (the pre-r13 code) throws "No FileSystem for scheme"
    Artifacts.writeFiles(arts, dir)
    val fs = fsOf(dir)
    def bytesOf(rel: String): Seq[Byte] = {
      val in = fs.open(new Path(dir, rel))
      try Iterator.continually(in.read()).takeWhile(_ >= 0)
        .map(_.toByte).toSeq
      finally in.close()
    }
    assert(bytesOf("maps/e1.png") == Seq[Byte](1, 2, 3))
    assert(bytesOf("e2.bin") == Seq[Byte](9, 8, 7, 6))
    // idempotent replace (the at-least-once replay contract) through the
    // same FileSystem fallback
    Artifacts.writeFiles(Seq(("e2.bin", Array[Byte](5))).toDS(), dir)
    assert(bytesOf("e2.bin") == Seq[Byte](5))
  }
}
