package graft.sim

import graft.SparkSpec
import graft.expressions.GraftExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression pin for the sf1ish ANN crash (r8): a rank-topk
  * (WindowGroupLimit) above a MULTI-file array<float> parquet scan
  * NPE'd under the nested-column vectorized reader — the group-limit
  * iterator prefetches a buffered row whose lazy evaluation can run
  * after the scan closed its columnar batch, so the row's ColumnarArray
  * read nulled vectors ("this.floatData is null"). Single-file fixtures
  * mask it, which is why the oracle gate never saw it and the
  * GrowthSpan slice did. GraftSession ships with the nested vectorized
  * reader OFF; this spec drives the exact failing shape end-to-end on
  * the default session so a careless conf flip (or an upstream change)
  * re-surfaces as a red test instead of a cluster crash.
  */
class MultiFileArrayScanSpec extends SparkSpec {

  test("rank-topk over a multi-file array<float> parquet scan decodes every row") {
    val session = spark
    import session.implicits._
    val dim = 64
    val n = 20000
    // mostly-distinct floats (the sf1ish embeddings profile: plain
    // pages, dictionary overflow) across 10 files
    val tmp = java.nio.file.Files.createTempDirectory("graft-mfarray").toString
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * dim + j) % 100003) * 0.001f))
    }.toDF("vec_id", "embedding")
      .repartition(10, col("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/emb")

    val df = spark.read.parquet(s"$tmp/emb")
    // multi-FILE is the trigger surface (file/batch boundaries inside
    // and across tasks are where columnar batch lifecycles churn)
    val files = Option(new java.io.File(s"$tmp/emb").listFiles).toSeq.flatten
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 10, s"fixture must be a multi-file table, got $files")

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("vec_id"))
    val proj = df
      .select(col("vec_id"),
        GraftExpressions.hyperplaneBucket(col("embedding"),
          Array.tabulate(8 * dim)(k => math.sin(k.toDouble)), nBits = 8)
          .as("bucket"),
        aggregate(col("embedding"), lit(0.0d), (a, x) => a + x).as("score"))
      .withColumn("g", pmod(col("bucket"), lit(16)))
    val ranked = proj.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
    // per group: min(5, group size) survivors — every row's array was
    // decoded both in the bucket expression and the rank sort
    val expected = proj.groupBy("g").count()
      .agg(sum(least(col("count"), lit(5L)))).head().getLong(0)
    val rows = ranked.count()
    assert(rows == expected && rows > 0,
      s"expected $expected ranked rows, got $rows")
  }
}
