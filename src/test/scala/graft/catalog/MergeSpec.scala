package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** MERGE/upsert over versioned parquet: insert + update semantics, pointer
  * atomicity (readers see complete snapshots), version history, vacuum.
  */
class MergeSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("mergeInto: insert, update, and key dedup semantics") {
    val dir = Files.createTempDirectory("graft-merge").toString
    val v0 = Merge.mergeInto(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score"), Seq("id"))
    assert(v0 == 0)
    // update id=2, insert id=3
    val v1 = Merge.mergeInto(spark, dir,
      Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("id", "name", "score"), Seq("id"))
    assert(v1 == 1)
    val rows = Merge.read(spark, dir).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) == "b2" && rows(1).getDouble(2) == 25.0)
    assert(rows(0).getString(1) == "a") // untouched row survives

    // composite keys
    val dir2 = Files.createTempDirectory("graft-merge2").toString
    Merge.mergeInto(spark, dir2,
      Seq(("x", 1, 1.0), ("x", 2, 2.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    Merge.mergeInto(spark, dir2,
      Seq(("x", 2, 9.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    val m = Merge.read(spark, dir2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m == Map(("x", 1) -> 1.0, ("x", 2) -> 9.0))
  }

  test("duplicate-keyed updates resolve to one deterministic winner") {
    val target = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val dups = Seq((1L, "z", 5.0), (1L, "b", 9.0), (2L, "c", 3.0))
      .toDF("id", "name", "score")
    // winner per key = greatest non-key tuple (name desc, score desc)
    val merged = Merge.mergeFrames(target, dups, Seq("id"))
      .orderBy("id").collect()
    assert(merged.length == 2)
    assert((merged(0).getString(1), merged(0).getDouble(2)) == (("z", 5.0)))
    // partitioning-independent: same winner from a repartitioned input
    val again = Merge.mergeFrames(target, dups.repartition(7), Seq("id"))
      .orderBy("id").collect()
    assert(again.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      merged.map(r => (r.getString(1), r.getDouble(2))).toSeq)
  }

  private def filesUnder(dir: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        base.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  test("bucketed merge rewrites only the touched buckets") {
    val dir = Files.createTempDirectory("graft-bmerge").toString
    val base = (0L until 100L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "score")
    assert(BucketedMerge.mergeInto(spark, dir, base, Seq("id"), nBuckets = 8) == 0L)

    val up = Seq((7L, "u7", 70.0), (13L, "u13", 130.0), (1007L, "new", 1.0))
      .toDF("id", "name", "score")
    val touched = up.select(BucketedMerge.bucketExpr(Seq("id"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(touched.size < 8, "fixture keys must not span every bucket")

    val before = filesUnder(dir)
    assert(BucketedMerge.mergeInto(spark, dir, up, Seq("id")) == 1L)
    val after = filesUnder(dir)

    // untouched buckets: manifest still points at v=0 and their files are
    // byte-identical (same path, same content — never rewritten)
    val m1 = BucketedMerge.readManifest(dir, 1L)
    assert(m1.nBuckets == 8)
    (0 until 8).filterNot(touched).foreach { b =>
      assert(m1.buckets(b) == 0L, s"untouched bucket $b was repointed")
      val untouchedFiles = before.keys.filter(_.startsWith(s"v=0/bucket=$b/"))
      assert(untouchedFiles.nonEmpty)
      untouchedFiles.foreach(f => assert(after(f) == before(f), s"$f changed"))
    }
    touched.foreach(b => assert(m1.buckets(b) == 1L))

    // results match the pure MERGE combinator exactly
    val expect = Merge.mergeFrames(base, up, Seq("id")).orderBy("id").collect()
    val got = BucketedMerge.read(spark, dir).orderBy("id").collect()
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq)
  }

  test("bucketed merge into a previously-empty bucket") {
    val dir = Files.createTempDirectory("graft-bnew").toString
    // one key → exactly one bucket exists after create
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a")).toDF("id", "v"), Seq("id"), nBuckets = 16)
    val m0 = BucketedMerge.readManifest(dir, 0L)
    assert(m0.buckets.size == 1)
    // find a key hashing to a DIFFERENT bucket and merge it
    val b0 = m0.buckets.keys.head
    val other = (2L to 200L).find { k =>
      Seq((k, "x")).toDF("id", "v")
        .select(BucketedMerge.bucketExpr(Seq("id"), 16))
        .collect()(0).getInt(0) != b0
    }.get
    BucketedMerge.mergeInto(spark, dir, Seq((other, "b")).toDF("id", "v"), Seq("id"))
    val m1 = BucketedMerge.readManifest(dir, 1L)
    assert(m1.buckets.size == 2)
    assert(m1.buckets(b0) == 0L, "existing bucket must not be rewritten")
    val rows = BucketedMerge.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (other, "b")))
  }

  test("bucketed vacuum keeps version dirs still referenced by the manifest") {
    val dir = Files.createTempDirectory("graft-bvac").toString
    val base = (0L until 50L).map(i => (i, i * 1.0)).toDF("id", "v")
    BucketedMerge.mergeInto(spark, dir, base, Seq("id"), nBuckets = 4)
    BucketedMerge.mergeInto(spark, dir,
      Seq((7L, 700.0)).toDF("id", "v"), Seq("id"))
    BucketedMerge.mergeInto(spark, dir,
      Seq((8L, 800.0)).toDF("id", "v"), Seq("id"))
    BucketedMerge.vacuum(dir, keep = 1)
    // v=0 still holds current data for buckets untouched since create
    assert(Files.exists(java.nio.file.Paths.get(dir, "v=0")))
    val rows = BucketedMerge.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(7L) == 700.0 && rows(8L) == 800.0 && rows(3L) == 3.0)
    assert(rows.size == 50)

    // rewrite every bucket, then vacuum really drops the stale versions
    BucketedMerge.mergeInto(spark, dir, base, Seq("id"))
    BucketedMerge.vacuum(dir, keep = 1)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "v=0")))
    assert(BucketedMerge.read(spark, dir).count() == 50)
  }

  test("snapshots are immutable; old version stays readable until vacuum") {
    val dir = Files.createTempDirectory("graft-merge3").toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    val snap0 = spark.read.parquet(s"$dir/v=0") // pin the old snapshot
    Merge.mergeInto(spark, dir, Seq((1L, "a2")).toDF("id", "v"), Seq("id"))
    // a reader that resolved v=0 before the swap still sees it complete
    assert(snap0.collect()(0).getString(1) == "a")
    assert(Merge.read(spark, dir).collect()(0).getString(1) == "a2")
    assert(Merge.currentVersion(dir).contains(1L))

    Merge.mergeInto(spark, dir, Seq((1L, "a3")).toDF("id", "v"), Seq("id"))
    Merge.vacuum(dir, keep = 1)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "v=0")))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "v=1")))
    assert(Merge.read(spark, dir).collect()(0).getString(1) == "a3")
  }

  test("time travel + CDC: snapshot diff classifies insert/update/delete") {
    val dir = Files.createTempDirectory("graft-cdc").toString
    val v0 = Merge.writeSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    val v1 = Merge.writeSnapshot(
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v"), dir)

    // time travel: both versions stay readable
    assert(Merge.readVersion(spark, dir, v0).count() == 3)
    assert(Merge.readVersion(spark, dir, v1).count() == 3)

    val diff = Merge.changes(spark, dir, v0, v1, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(diff == Set((2L, "update"), (3L, "delete"), (4L, "insert")), diff)

    // self-diff is empty; reversed diff flips insert/delete
    assert(Merge.changes(spark, dir, v1, v1, Seq("id")).count() == 0)
    val rev = Merge.changes(spark, dir, v1, v0, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(rev == Set((2L, "update"), (3L, "insert"), (4L, "delete")), rev)
  }

  test("CDC detects values hopping between columns with compensating nulls") {
    // hash functions skip null args, so (a=null,b='x') -> (a='x',b=null)
    // must not collide into "unchanged" (the round-3 advisory)
    val dir = Files.createTempDirectory("graft-cdc-null").toString
    val v0 = Merge.writeSnapshot(
      Seq((1L, Option.empty[String], Option("x")),
        (2L, Option("same"), Option.empty[String])).toDF("id", "a", "b"), dir)
    val v1 = Merge.writeSnapshot(
      Seq((1L, Option("x"), Option.empty[String]),
        (2L, Option("same"), Option.empty[String])).toDF("id", "a", "b"), dir)
    val diff = Merge.changes(spark, dir, v0, v1, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(diff == Set((1L, "update")), diff)

    // and a real empty string must not read as a null
    val v2 = Merge.writeSnapshot(
      Seq((1L, Option("x"), Option("")),
        (2L, Option("same"), Option.empty[String])).toDF("id", "a", "b"), dir)
    val diff2 = Merge.changes(spark, dir, v1, v2, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(diff2 == Set((1L, "update")), diff2)
  }

  test("bucketed merge rejects an update batch whose key TYPE differs") {
    val dir = Files.createTempDirectory("graft-btype").toString
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a")).toDF("id", "name"), Seq("id"), nBuckets = 4)
    // Murmur3 is type-dependent: hash(1: int) != hash(1L), so an int-keyed
    // batch would compute touched buckets inconsistent with where the
    // union-coerced rows actually land
    val intKeyed = Seq((2, "b")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      BucketedMerge.mergeInto(spark, dir, intKeyed, Seq("id"))
    }
  }

  test("bucketed vacuum never touches versions ABOVE the current pointer") {
    val dir = Files.createTempDirectory("graft-bvac2").toString
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a")).toDF("id", "name"), Seq("id"), nBuckets = 4)
    // simulate an in-flight merge that has laid down v=1 data + manifest
    // but not yet swapped _CURRENT: vacuum must leave both alone
    val m0 = BucketedMerge.readManifest(dir, 0L)
    val vdir = java.nio.file.Paths.get(dir, "v=1", "bucket=0")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.write(java.nio.file.Paths.get(dir, "manifest-1.txt"),
      s"nBuckets=${m0.nBuckets}\n0=1".getBytes("UTF-8"))
    BucketedMerge.vacuum(dir, keep = 1)
    assert(Files.exists(vdir.resolve("part-0.parquet")),
      "vacuum deleted an in-flight merge's data")
    assert(Files.exists(java.nio.file.Paths.get(dir, "manifest-1.txt")),
      "vacuum deleted an in-flight merge's manifest")
    // and the current version itself survives, still readable
    assert(BucketedMerge.read(spark, dir).count() == 1L)
  }

  test("reading a bucketed table with no data fails with a clear message") {
    val dir = Files.createTempDirectory("graft-bempty").toString
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    BucketedMerge.mergeInto(spark, dir, empty, Seq("id"), nBuckets = 4)
    val e = intercept[IllegalStateException] {
      BucketedMerge.read(spark, dir)
    }
    assert(e.getMessage.contains("no data"), e.getMessage)
  }

  // Pins the sidecar I/O resolving through the table path's OWN filesystem:
  // a URI-form dir (file:/...) is invisible to java.nio probes, so the old
  // pointer read reported "never written" — the second merge would have
  // reset history to v=0 instead of merging, and vacuum no-opped. On a
  // cluster (hdfs://, s3a://) that was every table path.
  test("Merge: full lifecycle over a URI-form table path") {
    val dir = "file:" + Files.createTempDirectory("graft-merge-uri")
    assert(Merge.mergeInto(spark, dir,
      Seq((1L, "a")).toDF("id", "name"), Seq("id")) == 0L)
    assert(Merge.mergeInto(spark, dir,
      Seq((1L, "a2"), (2L, "b")).toDF("id", "name"), Seq("id")) == 1L)
    val rows = Merge.read(spark, dir).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a2"), (2L, "b")))
    // time travel + CDC still resolve versions through the URI
    assert(Merge.readVersion(spark, dir, 0L).count() == 1L)
    val ch = Merge.changes(spark, dir, 0L, 1L, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(ch == Map(1L -> "update", 2L -> "insert"))
    // vacuum actually deletes through the URI (keep=1 drops v=0)
    Merge.vacuum(dir, keep = 1)
    assert(intercept[IllegalArgumentException](
      Merge.readVersion(spark, dir, 0L)).getMessage.contains("not present"))
    assert(Merge.read(spark, dir).count() == 2L)
  }

  test("BucketedMerge: merge + incremental scan over a URI-form table path") {
    val dir = "file:" + Files.createTempDirectory("graft-bmerge-uri")
    assert(BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Seq("id"), nBuckets = 4) == 0L)
    assert(BucketedMerge.mergeInto(spark, dir,
      Seq((2L, "b2")).toDF("id", "name"), Seq("id")) == 1L)
    val rows = BucketedMerge.read(spark, dir).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2")))
    val (changed, df) = BucketedMerge.readChanged(spark, dir, 0L, 1L)
    assert(changed.nonEmpty && df.get.count() >= 1L)
  }

  // Pins the r13 pointer-loss recovery (ADVICE round 12): on a filesystem
  // without atomic rename-over-existing the _CURRENT swap has a
  // delete→rename window; a crash inside it used to read as "table never
  // written" and the next merge RESTARTED history at v=0 beside live data.
  test("Merge: a lost _CURRENT pointer recovers from the committed snapshots") {
    val dir = Files.createTempDirectory("graft-merge-recover").toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "name"), Seq("id"))
    Merge.mergeInto(spark, dir, Seq((2L, "b")).toDF("id", "name"), Seq("id"))
    SnapshotIo.delete(s"$dir/_CURRENT") // the crash window
    assert(Merge.currentVersion(dir).contains(1L))
    assert(Merge.read(spark, dir).count() == 2L)
    // history continues at v=2, never resets to v=0
    assert(Merge.mergeInto(spark, dir,
      Seq((3L, "c")).toDF("id", "name"), Seq("id")) == 2L)
    assert(Merge.read(spark, dir).count() == 3L)
  }

  test("Merge recovery never resurrects an uncommitted snapshot (no _SUCCESS)") {
    val dir = Files.createTempDirectory("graft-merge-norez").toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "name"), Seq("id"))
    // a crashed writeSnapshot: v=7 data dir exists, committer marker absent
    SnapshotIo.mkdirs(s"$dir/v=7")
    SnapshotIo.delete(s"$dir/_CURRENT")
    assert(Merge.currentVersion(dir).contains(0L))
    // and with NO committed evidence at all, the table reads never-written
    val empty = Files.createTempDirectory("graft-merge-empty2").toString
    SnapshotIo.mkdirs(s"$empty/v=3") // bare uncommitted leftovers only
    assert(Merge.currentVersion(empty).isEmpty)
  }

  test("BucketedMerge: pointer recovery follows the manifest, not _SUCCESS") {
    val dir = Files.createTempDirectory("graft-bmerge-recover").toString
    BucketedMerge.mergeInto(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Seq("id"), nBuckets = 4)
    BucketedMerge.mergeInto(spark, dir,
      Seq((2L, "b2")).toDF("id", "name"), Seq("id"))
    // a crashed merge: v=2 bucket data fully committed (_SUCCESS present)
    // but the manifest write never happened — recovery must pick v=1 (the
    // newest manifest), because without manifest-2 the v=2 data is
    // unreachable and reporting version 2 would fail every read
    Seq((1L, "poison")).toDF("id", "name")
      .withColumn("bucket", BucketedMerge.bucketExpr(Seq("id"), 4))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/v=2")
    SnapshotIo.delete(s"$dir/_CURRENT")
    assert(BucketedMerge.currentVersion(dir).contains(1L))
    val rows = BucketedMerge.read(spark, dir).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2")))
  }
}

