package graft.catalog

import graft.SparkSpec
import graft.testfs.CrashFileSystem
import org.apache.spark.sql.DataFrame

/** Crash-point fuzz of the versioned-merge lifecycle: a simulated process
  * crash at EVERY filesystem mutation of a merge (create / rename /
  * delete / mkdirs, injected by [[graft.testfs.CrashFileSystem]]) must
  * leave the table in a state that is (a) READABLE, (b) exactly the
  * pre-merge or the post-merge contents — never a blend, never empty —
  * and (c) REPAIRABLE: the next merge over the surviving state succeeds
  * and produces exactly the upsert of its batch onto whatever survived,
  * with no duplicate keys and no history reset to v=0.
  *
  * This is the executable form of the Merge/SnapshotIo crash-window
  * scaladocs (pointer swap atomicity, manifest-before-pointer ordering,
  * committed-evidence recovery): instead of arguing each window, every
  * window is induced and the invariants checked on the bytes left behind.
  */
class CrashFuzzSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def crashDir(prefix: String): String = {
    CrashFileSystem.register(spark)
    CrashFileSystem.Scheme + ":" +
      java.nio.file.Files.createTempDirectory(prefix)
  }

  private def toDf(m: Seq[(Long, String)]): DataFrame =
    m.toDF("id", "name").repartition(1)

  private def stateOf(d: DataFrame): Map[Long, String] =
    d.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap

  private val S0 = Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "a")
  private val D2 = Seq(3L -> "b", 4L -> "b", 5L -> "b", 6L -> "b")
  private val D3 = Seq(5L -> "c", 6L -> "c", 7L -> "c", 8L -> "c")
  private val S1 = S0 ++ D2

  /** Mutation-point schedule: exhaustive when the op count is small,
    * else dense on both tails (where the sidecar swaps live) + strided
    * through the bulk (the parquet writer's per-file ops, each protected
    * by the same committer pattern as its neighbors).
    */
  private def schedule(n: Long): Seq[Long] = {
    val stride = math.max(1L, n / 48)
    (0L until n).filter(k =>
      k < 16 || k >= n - 16 || k % stride == 0)
  }

  private def fuzz(name: String,
      seed: (String, DataFrame) => Unit,
      merge: (String, DataFrame) => Unit,
      read: String => Map[Long, String]): Unit = {
    // count the mutations of one clean merge cycle (fuse at infinity)
    val probeDir = crashDir(s"graft-crashfuzz-$name-probe")
    seed(probeDir, toDf(S0.toSeq))
    CrashFileSystem.arm(Long.MaxValue)
    merge(probeDir, toDf(D2))
    val n = CrashFileSystem.disarm()
    assert(n > 0, "probe measured no mutations — injection not wired")

    val points = schedule(n)
    var tested = 0
    points.foreach { k =>
      val dir = crashDir(s"graft-crashfuzz-$name-k$k")
      seed(dir, toDf(S0.toSeq))
      CrashFileSystem.arm(k)
      val crashed =
        try { merge(dir, toDf(D2)); false }
        catch { case _: Throwable => true }
      CrashFileSystem.disarm()
      assert(crashed, s"k=$k of $n mutations: merge completed under the fuse")

      // (a) readable, (b) pre- or post-merge exactly
      val observed = read(dir)
      assert(observed == S0 || observed == S1,
        s"k=$k: observed neither state: $observed")
      // (c) repairable: next merge = exact upsert onto the survivor,
      // version advances (never resets), no duplicate keys
      val vBefore = Merge.currentVersion(dir).getOrElse(
        fail(s"k=$k: no recoverable version"))
      merge(dir, toDf(D3))
      val repaired = read(dir)
      assert(repaired == observed ++ D3, s"k=$k: repair mismatch: $repaired")
      assert(Merge.currentVersion(dir).contains(vBefore + 1),
        s"k=$k: version did not advance monotonically")
      tested += 1
    }
    info(s"$name: $tested crash points over $n mutations, all invariants held")
  }

  private def withSmallShuffle(body: => Unit): Unit = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("Merge: crash at every filesystem mutation is readable + repairable") {
    withSmallShuffle {
      fuzz("merge",
        seed = (dir, df) => { Merge.mergeInto(spark, dir, df, Seq("id")); () },
        merge = (dir, df) => { Merge.mergeInto(spark, dir, df, Seq("id")); () },
        read = dir => stateOf(Merge.read(spark, dir)))
    }
  }

  test("BucketedMerge: crash at every filesystem mutation is readable + repairable") {
    withSmallShuffle {
      fuzz("bucketed",
        seed = (dir, df) =>
          { BucketedMerge.mergeInto(spark, dir, df, Seq("id"), nBuckets = 2); () },
        merge = (dir, df) =>
          { BucketedMerge.mergeInto(spark, dir, df, Seq("id"), nBuckets = 2); () },
        read = dir => stateOf(BucketedMerge.read(spark, dir)))
    }
  }

  // --- vacuum: crash mid-delete never touches the live snapshot ---

  private def vacuumFuzz(name: String,
      merge: (String, Seq[(Long, String)]) => Unit,
      read: String => Map[Long, String],
      vacuum: String => Unit): Unit = {
    val D2m = Map(D2: _*)
    val D3m = Map(D3: _*)
    val s2 = S0 ++ D2m ++ D3m
    def seed3(dir: String): Unit = {
      merge(dir, S0.toSeq); merge(dir, D2); merge(dir, D3)
    }
    val probe = crashDir(s"graft-vacfuzz-$name-probe")
    seed3(probe)
    CrashFileSystem.arm(Long.MaxValue)
    vacuum(probe)
    val n = CrashFileSystem.disarm()
    assert(n > 0, "vacuum probe measured no mutations")
    assert(read(probe) == s2)

    schedule(n).foreach { k =>
      val dir = crashDir(s"graft-vacfuzz-$name-k$k")
      seed3(dir)
      CrashFileSystem.arm(k)
      val crashed = try { vacuum(dir); false } catch { case _: Throwable => true }
      CrashFileSystem.disarm()
      assert(crashed, s"k=$k of $n: vacuum completed under the fuse")
      // live snapshot untouched by the partial vacuum
      assert(read(dir) == s2, s"k=$k: vacuum crash corrupted the snapshot")
      // re-vacuum completes; the table keeps working (one more merge)
      vacuum(dir)
      assert(read(dir) == s2, s"k=$k")
      merge(dir, Seq(9L -> "d"))
      assert(read(dir) == s2 + (9L -> "d"), s"k=$k")
    }
    info(s"$name vacuum: ${schedule(n).size} crash points over $n deletes held")
  }

  test("Merge.vacuum: crash mid-delete never corrupts the live snapshot") {
    withSmallShuffle {
      vacuumFuzz("merge",
        merge = (dir, rows) => { Merge.mergeInto(spark, dir, toDf(rows), Seq("id")); () },
        read = dir => stateOf(Merge.read(spark, dir)),
        vacuum = dir => Merge.vacuum(dir, keep = 1))
    }
  }

  test("BucketedMerge.vacuum: crash mid-delete never corrupts the live snapshot") {
    withSmallShuffle {
      vacuumFuzz("bucketed",
        merge = (dir, rows) =>
          { BucketedMerge.mergeInto(spark, dir, toDf(rows), Seq("id"), nBuckets = 2); () },
        read = dir => stateOf(BucketedMerge.read(spark, dir)),
        vacuum = dir => BucketedMerge.vacuum(dir, keep = 1))
    }
  }

  // --- artifact sink: per-file atomicity under crash ---

  test("Artifacts.writeFiles: a crash never exposes a partial artifact; replay converges") {
    withSmallShuffle {
      import graft.sinks.Artifacts
      val a1 = ("one.bin", Array.tabulate(4096)(i => (i % 251).toByte))
      val a2 = ("sub/two.bin", Array.tabulate(8192)(i => ((i * 7) % 253).toByte))
      def ds = Seq(a1, a2).toDS().repartition(1)
      def check(dir: String, k: Long, requireAll: Boolean): Unit = {
        val local = dir.stripPrefix(CrashFileSystem.Scheme + ":")
        Seq(a1, a2).foreach { case (rel, bytes) =>
          val f = java.nio.file.Paths.get(local, rel)
          if (java.nio.file.Files.exists(f)) {
            // atomicity: a visible artifact is ALWAYS complete
            assert(java.util.Arrays.equals(
              java.nio.file.Files.readAllBytes(f), bytes),
              s"k=$k: partial/corrupt artifact $rel")
          } else assert(!requireAll, s"k=$k: missing artifact $rel after replay")
        }
      }
      val probe = crashDir("graft-artfuzz-probe")
      CrashFileSystem.arm(Long.MaxValue)
      Artifacts.writeFiles(ds, probe)
      val n = CrashFileSystem.disarm()
      assert(n > 0)
      check(probe, -1L, requireAll = true)

      schedule(n).foreach { k =>
        val dir = crashDir(s"graft-artfuzz-k$k")
        CrashFileSystem.arm(k)
        val crashed = try { Artifacts.writeFiles(ds, dir); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n")
        check(dir, k, requireAll = false) // whatever is visible is complete
        Artifacts.writeFiles(ds, dir) // the pipeline's at-least-once replay
        check(dir, k, requireAll = true)
      }
      info(s"artifacts: ${schedule(n).size} crash points over $n held")
    }
  }

  // --- publish: crash + replay never duplicates a subject ---

  test("Catalog.publish: crash at every mutation + replay keeps subjects unique") {
    withSmallShuffle {
      def docs(paths: String*): DataFrame =
        paths.toSeq.toDF("path")
          .withColumn("content", org.apache.spark.sql.functions.lit("bytes"))
          .withColumn("metadata_json", org.apache.spark.sql.functions.lit("{}"))
          .repartition(1)
          .transform(Catalog.dataciteDoc(_))
      val batch1 = docs("/d/a.emd", "/d/b.emd")
      // overlap with batch1 + a new doc + an intra-batch duplicate
      val batch2 = docs("/d/b.emd", "/d/c.emd", "/d/c.emd")
      def subjects(path: String): Seq[String] =
        spark.read.parquet(path).select("subject").collect()
          .map(_.getString(0)).toSeq

      val probe = crashDir("graft-pubfuzz-probe")
      Catalog.publish(spark, batch1, probe)
      CrashFileSystem.arm(Long.MaxValue)
      Catalog.publish(spark, batch2, probe)
      val n = CrashFileSystem.disarm()
      assert(n > 0)
      assert(subjects(probe).sorted == Seq("globus:///d/a.emd",
        "globus:///d/b.emd", "globus:///d/c.emd"))

      schedule(n).foreach { k =>
        val cat = crashDir(s"graft-pubfuzz-k$k")
        Catalog.publish(spark, batch1, cat)
        CrashFileSystem.arm(k)
        val crashed = try { Catalog.publish(spark, batch2, cat); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n: publish completed under the fuse")
        // at-least-once replay, then assert convergence with NO duplicates
        Catalog.publish(spark, batch2, cat)
        val subs = subjects(cat)
        assert(subs.sorted == Seq("globus:///d/a.emd", "globus:///d/b.emd",
          "globus:///d/c.emd"), s"k=$k: $subs")
      }
      info(s"publish: ${schedule(n).size} crash points over $n mutations held")
    }
  }

  test("CorpusIngest: a crashed FIRST batch never wedges the ledger (staging-only dirs read as empty)") {
    withSmallShuffle {
      import graft.pipelines.CorpusIngestPipeline.processBatch
      val batch1 = Seq(("/land/a.txt", GoodA)).toDF("path", "content").repartition(1)
      // probe the first batch's mutation count
      val (pc, pl) = (crashDir("corpus-first-probe"), crashDir("ledger-first-probe"))
      CrashFileSystem.arm(Long.MaxValue)
      processBatch(spark, batch1, pc, pl, 0L, 0.2)
      val n = CrashFileSystem.disarm()
      schedule(n).foreach { k =>
        val (c, l) = (crashDir("corpus-first"), crashDir("ledger-first"))
        CrashFileSystem.arm(k)
        val crashed = try { processBatch(spark, batch1, c, l, 0L, 0.2); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n")
        // the stream's retry of batch 0 — before the committed-data probe
        // fix, a staging-only ledger/corpus dir failed schema inference
        // here on EVERY retry (permanent wedge)
        processBatch(spark, batch1, c, l, 0L, 0.2)
        val corpus = spark.read.parquet(c).select("text").collect().map(_.getString(0))
        assert(corpus.toSeq == Seq(GoodA), s"k=$k: $corpus")
        assert(spark.read.parquet(l).count() == 1, s"k=$k")
      }
      info(s"first-batch wedge: ${schedule(n).size} crash points over $n held")
    }
  }

  // --- incremental scan across a crashed-and-recovered boundary ---

  test("BucketedMerge.readChanged spans a crashed-and-recovered version boundary") {
    withSmallShuffle {
      val nBuckets = 2
      def seed(dir: String): Unit = {
        BucketedMerge.mergeInto(spark, dir, toDf(S0.toSeq), Seq("id"), nBuckets)
        BucketedMerge.mergeInto(spark, dir, toDf(D2), Seq("id"), nBuckets)
        ()
      }
      // probe the D3 merge's mutation count
      val probe = crashDir("graft-cdcfuzz-probe")
      seed(probe)
      CrashFileSystem.arm(Long.MaxValue)
      BucketedMerge.mergeInto(spark, probe, toDf(D3), Seq("id"), nBuckets)
      val n = CrashFileSystem.disarm()
      assert(n > 0)

      // bucket of each key under the table's hash layout — for replaying
      // the CDC consumer contract driver-side
      val allKeys = (S1 ++ D3).keys.toSeq.sorted
      val bucketOf: Map[Long, Int] = {
        import org.apache.spark.sql.functions.col
        allKeys.toDF("id")
          .select(col("id"), BucketedMerge.bucketExpr(Seq("id"), nBuckets).as("b"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      }

      val s2 = S1 ++ D3
      schedule(n).foreach { k =>
        val dir = crashDir(s"graft-cdcfuzz-k$k")
        seed(dir)
        CrashFileSystem.arm(k)
        val crashed =
          try { BucketedMerge.mergeInto(spark, dir, toDf(D3), Seq("id"), nBuckets); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n: merge completed under the fuse")

        // at-least-once recovery: replay the same update batch
        BucketedMerge.mergeInto(spark, dir, toDf(D3), Seq("id"), nBuckets)
        assert(stateOf(BucketedMerge.read(spark, dir)) == s2, s"k=$k")
        val vCur = BucketedMerge.currentVersion(dir).get

        // the consumer contract: a reader that processed v1 and applies
        // readChanged(1, vCur) — replacing the changed buckets wholesale —
        // reconstructs the current state exactly, across the boundary the
        // crash + recovery left behind (vCur may be 2 or 3 depending on
        // whether the crashed merge's manifest committed)
        val (changed, dfOpt) = BucketedMerge.readChanged(spark, dir, 1L, vCur)
        assert(changed.nonEmpty, s"k=$k: D3 touched no buckets?")
        val delta = dfOpt.map(stateOf).getOrElse(Map.empty)
        val reconstructed =
          S1.filterNot { case (id, _) => changed.contains(bucketOf(id)) } ++ delta
        assert(reconstructed == s2,
          s"k=$k: consumer replay mismatch: changed=$changed delta=$delta")
      }
      info(s"readChanged boundary: ${schedule(n).size} crash points over $n held")
    }
  }

  // --- corpus ingest: crash + at-least-once replay = exactly-once ---

  private val GoodA = "the quick brown fox jumps over the lazy dog and " +
    "runs down to the river in the cold morning light of early spring"
  private val GoodB = "a long walk in the woods clears the mind and the " +
    "steady sound of rain on the leaves carries far into the evening"
  private val Junk = "!!!??!?!...,,;;;!!!"

  test("CorpusIngest: crash at every mutation + stream replay keeps the corpus exactly-once") {
    withSmallShuffle {
      import graft.pipelines.CorpusIngestPipeline.processBatch
      def fileDf(rows: Seq[(String, String)]): DataFrame =
        rows.toDF("path", "content").repartition(1)
      val batch1 = Seq(("/land/a.txt", GoodA))
      // replayed batch: a cross-batch duplicate (ledger dedup), a
      // within-batch duplicate (first-wins by min path), and a
      // quality-gated junk doc
      val batch2 = Seq(
        ("/land/a-copy.txt", GoodA),
        ("/land/b2.txt", GoodB),
        ("/land/b1.txt", GoodB),
        ("/land/junk.txt", Junk))

      def invariants(corpusDir: String, ledgerDir: String, k: Long): Unit = {
        val corpus = spark.read.parquet(corpusDir)
          .select("content_key", "path", "text", "batch_id").collect()
        assert(corpus.length == 2, s"k=$k: corpus ${corpus.toSeq}")
        val byText = corpus.map(r =>
          r.getAs[String]("text") -> r).toMap
        // partition-column inference reads batch_id back as int
        def bid(r: org.apache.spark.sql.Row): Long =
          r.getAs[Number]("batch_id").longValue
        assert(bid(byText(GoodA)) == 0L, s"k=$k")
        assert(bid(byText(GoodB)) == 1L, s"k=$k")
        // within-batch first-wins: min path
        assert(byText(GoodB).getAs[String]("path") == "/land/b1.txt", s"k=$k")
        val ledger = spark.read.parquet(ledgerDir).select("content_key").collect()
          .map(_.getString(0))
        assert(ledger.length == 2 && ledger.distinct.length == 2, s"k=$k")
        assert(ledger.sorted.sameElements(
          corpus.map(_.getAs[String]("content_key")).sorted), s"k=$k")
      }

      // probe a clean cycle for the mutation count
      val (pc, pl) = (crashDir("corpus-probe"), crashDir("ledger-probe"))
      processBatch(spark, fileDf(batch1), pc, pl, 0L, 0.2)
      CrashFileSystem.arm(Long.MaxValue)
      processBatch(spark, fileDf(batch2), pc, pl, 1L, 0.2)
      val n = CrashFileSystem.disarm()
      assert(n > 0, "probe measured no mutations — injection not wired")
      invariants(pc, pl, -1L)

      var tested = 0
      schedule(n).foreach { k =>
        val (corpusDir, ledgerDir) = (crashDir("corpus"), crashDir("ledger"))
        processBatch(spark, fileDf(batch1), corpusDir, ledgerDir, 0L, 0.2)
        CrashFileSystem.arm(k)
        val crashed =
          try { processBatch(spark, fileDf(batch2), corpusDir, ledgerDir, 1L, 0.2); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n: batch completed under the fuse")
        // the stream's at-least-once retry: SAME batch id
        processBatch(spark, fileDf(batch2), corpusDir, ledgerDir, 1L, 0.2)
        invariants(corpusDir, ledgerDir, k)
        // and a second replay (duplicate delivery after success) is a no-op
        processBatch(spark, fileDf(batch2), corpusDir, ledgerDir, 1L, 0.2)
        invariants(corpusDir, ledgerDir, k)
        tested += 1
      }
      info(s"corpus ingest: $tested crash points over $n mutations, exactly-once held")
    }
  }
}
