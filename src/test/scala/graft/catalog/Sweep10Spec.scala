package graft.catalog

import graft.SparkSpec
import graft.testfs.ReadPoisonFileSystem

/** Run-the-claims sweep #10 over the r14 hardening, catalog side (r15
  * verdict task 3b): [[Merge.currentVersion]]'s IOException retry was
  * built for TRANSIENT read races (Sweep9Spec's racing reader) — this
  * pins the PERMANENT failure mode: a pointer that throws on every read
  * attempt (persistent permission/device fault) must exhaust a bounded
  * retry and recover through committed evidence, not loop and not report
  * None-as-empty-table (which would let the next merge restart history
  * at v=0 beside live data).
  */
class Sweep10Spec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("a PERMANENTLY unreadable pointer: bounded retries, then committed-evidence recovery") {
    val local = java.nio.file.Files.createTempDirectory("graft-sweep10-ptr")
    val dir = local.toString
    Merge.mergeInto(spark, dir, Seq((1L, "a")).toDF("id", "name"), Seq("id"))
    Merge.mergeInto(spark, dir, Seq((2L, "b")).toDF("id", "name"), Seq("id"))
    assert(Merge.currentVersion(dir).contains(1L))

    ReadPoisonFileSystem.register(spark)
    val poisoned = ReadPoisonFileSystem.Scheme + ":" + dir
    ReadPoisonFileSystem.poisonNames = Set("_CURRENT")
    ReadPoisonFileSystem.attempts.set(0)
    try {
      // every open of _CURRENT throws; _SUCCESS markers + snapshot data
      // stay readable — recovery must land on the committed v1
      assert(Merge.currentVersion(poisoned).contains(1L),
        "permanent pointer failure must recover via committed evidence")
      val n = ReadPoisonFileSystem.attempts.get
      assert(n >= 2 && n <= 8,
        s"expected a small bounded retry count, saw $n open attempts")
      // and the recovered version serves the right DATA through the same
      // poisoned scheme (None-as-empty would read zero rows or v=0)
      val rows = Merge.read(spark, poisoned)
        .select("id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "a"), (2L, "b")))
    } finally {
      ReadPoisonFileSystem.poisonNames = Set.empty
    }
  }
}
