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

  test("zorder kernel: known interleavings and quadrant ordering") {
    import graft.expressions.HashOps.interleave31
    assert(interleave31(0L, 0L) == 0L)
    assert(interleave31(1L, 0L) == 1L)   // x bits land at even positions
    assert(interleave31(0L, 1L) == 2L)   // y bits at odd
    assert(interleave31(3L, 1L) == 7L)   // 0b11 ⨯ 0b01 → 0b0111
    assert(interleave31((1L << 31) - 1, (1L << 31) - 1) == (1L << 62) - 1)
    // quadrants order lexicographically on (high-bit y, high-bit x)
    val h = 1L << 30
    val q = Seq((0L, 0L), (h, 0L), (0L, h), (h, h)).map((interleave31 _).tupled)
    assert(q == q.sorted)
  }

  test("writeZOrdered: every file is a contiguous run of the global Morton order") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    import spark.implicits._
    // 128×128 uniform grid
    val grid = spark.range(128L * 128L)
      .select((col("id") % 128).as("x"), expr("id div 128").as("y"))
    Layout.writeZOrdered(grid, "x", "y", nFiles = 16, out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length >= 8)
    // EXACT, split-point-independent characterization (closes the r11/r12
    // flake for good): repartitionByRange samples its boundaries with a
    // seed derived from RDD ids — nondeterministic across concurrent-suite
    // scheduling — so ANY assertion about specific tile geometry (the old
    // 75th-pct span / point-overlap margins) was betting on the sample.
    // What range partitioning + sortWithinPartitions guarantees for EVERY
    // possible boundary choice is stronger and exact: each file is a
    // CONTIGUOUS RUN of the global Morton order — pairwise-disjoint
    // z-intervals containing every grid point inside them. Together with
    // the kernel tests above (interleaving + quadrant ordering pin Morton
    // LOCALITY), contiguous runs ARE the pruning property: a file's x/y
    // bounding box is exactly its z-interval's, which the curve keeps
    // tile-local. Recompute z per row with writeZOrdered's own
    // normalization (min 0, max 127 on this grid) and assert contiguity.
    import graft.expressions.HashOps.interleave31
    val bits = (1L << 31) - 1
    def normVal(v: Long): Long =
      math.floor(v.toDouble / 127.0 * bits.toDouble).toLong
    def zOf(x: Long, y: Long): Long = interleave31(normVal(x), normVal(y))
    val fileZ = files.map { f =>
      val zs = spark.read.parquet(f.getAbsolutePath).select("x", "y")
        .collect().map(r => zOf(r.getLong(0), r.getLong(1)))
      (zs.min, zs.max, zs.toSet)
    }.sortBy(_._1)
    // disjoint intervals...
    fileZ.sliding(2).foreach {
      case Array((_, hi, _), (lo2, _, _)) =>
        assert(hi < lo2, s"overlapping file z-intervals: $hi vs $lo2")
      case _ =>
    }
    // ...with NO grid point missing from the interval that covers it:
    // every file holds exactly the grid z-values inside [its min, its max]
    val allZ = (for (x <- 0L to 127L; y <- 0L to 127L) yield zOf(x, y)).toArray
    fileZ.foreach { case (lo, hi, zset) =>
      val expected = allZ.filter(z => z >= lo && z <= hi).toSet
      assert(zset == expected,
        s"file z-run [$lo,$hi] is not contiguous in the Morton order " +
          s"(holds ${zset.size} of ${expected.size} grid points)")
    }
    assert(spark.read.parquet(out).count() == 128L * 128L)
  }

  test("writeZOrdered: an empty input writes an empty table, not an NPE") {
    // round-12 sweep: the null min/max aggregates NPE'd out of getDouble
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("zorder-empty").toString
    Layout.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", 4, s"$out/t.parquet")
    assert(spark.read.parquet(s"$out/t.parquet").count() == 0)
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

  test("overwritePartitions: only the batch's partitions are replaced") {
    import graft.core.Tables
    val base = java.nio.file.Files.createTempDirectory("graft-dyn").toString
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", expr("ts div (86400L * 1000000000L)"))
      .select("event_id", "user_id", "value", "day")

    Layout.overwritePartitions(ev, "day", base)
    def fileSig(dir: java.io.File): Map[String, (Long, Long)] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val days = new java.io.File(base).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.length >= 2, s"need >= 2 day partitions, got ${days.toSeq}")
    val untouchedDay = days.head
    val targetDay = days.last.stripPrefix("day=").toLong
    val before = fileSig(new java.io.File(base, untouchedDay))

    // reprocess ONE day with modified values
    Layout.overwritePartitions(
      ev.filter(col("day") === targetDay).withColumn("value", col("value") * 2),
      "day", base)

    // untouched partition: identical files (names, sizes, mtimes)
    assert(fileSig(new java.io.File(base, untouchedDay)) == before)
    // target partition: the new values are what a reader sees
    val got = spark.read.parquet(base).filter(col("day") === targetDay)
      .agg(sum("value")).head().getDouble(0)
    val want = ev.filter(col("day") === targetDay)
      .agg(sum(col("value") * 2)).head().getDouble(0)
    assert(math.abs(got - want) < 1e-6)
    // row count conserved: no other partition lost rows
    assert(spark.read.parquet(base).count() == ev.count())
  }
}
