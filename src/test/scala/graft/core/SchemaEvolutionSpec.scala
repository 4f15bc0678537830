package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on read — the long-lived-ingest reality: batches
  * written months apart differ in columns, and a scan must unify them
  * (new columns null-backfilled for old files) without rewriting
  * history. Pins Spark's mergeSchema read behavior the catalog relies
  * on, plus the write-side `mergeSchema` overwrite guard.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema unifies drifted batches; old files null-backfill") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // epoch 1: (id, text)
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.parquet(s"$dir/batch=1")
    // epoch 2: adds a quality column
    Seq((3L, "c", 0.9), (4L, "d", 0.1)).toDF("id", "text", "quality")
      .write.parquet(s"$dir/batch=2")

    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.columns.toSet == Set("id", "text", "quality", "batch"))
    val rows = unified.select("id", "quality")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9), 4L -> Some(0.1)))
    // pushdown still works through the merged schema
    assert(unified.filter(col("quality") > 0.5).count() == 1)
  }

  test("default read (no mergeSchema) picks one schema — the footgun pinned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve2").toString
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 0.5)).toDF("id", "text", "quality").write.parquet(s"$dir/batch=2")
    val cols = spark.read.parquet(dir).columns.toSet
    // without mergeSchema the footer of an arbitrary file wins — quality
    // may silently vanish; this is WHY the ingest path must opt in
    assert(cols.contains("id") && cols.contains("text"))
  }
}
