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
}
