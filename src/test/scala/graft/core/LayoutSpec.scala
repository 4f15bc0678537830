package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout utilities: range-clustered writes produce files with DISJOINT
  * key intervals (the property footer pruning needs), and compaction
  * collapses small files without changing content.
  */
class LayoutSpec extends SparkSpec {

  test("writeRangeLayout: per-file key ranges are pairwise disjoint") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.writeRangeLayout(
      Tables.load(spark, sf, "lineitem"), "l_orderkey", nFiles = 8, out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected several range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi vs $lo2")
      case _ =>
    }
    // content survives the re-layout
    val n0 = Tables.load(spark, sf, "lineitem").count()
    assert(spark.read.parquet(out).count() == n0)
  }

  test("compact: many small files collapse to the computed target count") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact")
    val small = base.resolve("small").toString
    val compacted = base.resolve("compacted").toString
    // accrete 32 tiny files, the streaming-sink pathology
    Tables.load(spark, sf, "orders").repartition(32)
      .write.mode("overwrite").parquet(small)
    val nSmall = new java.io.File(small).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(nSmall == 32)

    val (before, after) = Layout.compact(spark, small, compacted,
      targetFileBytes = 1L * 1024 * 1024)
    assert(before == 32)
    assert(after < 8, s"compaction left $after files")
    // byte-identical content modulo order
    val a = spark.read.parquet(small).orderBy("o_orderkey").collect().map(_.toSeq)
    val b = spark.read.parquet(compacted).orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
