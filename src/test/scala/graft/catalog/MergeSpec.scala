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
}
