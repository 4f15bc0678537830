package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DataSource V2 surface: `spark.read.format("emd")` over a directory of
  * containers — schema, per-file partitioning, downstream composition.
  */
class EmdDataSourceSpec extends SparkSpec {

  test("format(\"emd\") reads a directory of containers as signal rows") {
    val dir = Files.createTempDirectory("graft-emd-dsv2")
    def emd(seed: Int) = Hdf5TestWriter.emd(Seq(
      Hdf5TestWriter.Sig("Image", "img", Seq(4L, 4L, 1L),
        (0 until 16).map(i => (i * seed).toDouble)),
      Hdf5TestWriter.Sig("SpectrumImage", "eds", Seq(2L, 2L, 3L),
        (0 until 12).map(i => (i + seed).toDouble),
        metadataJson = Some(s"""{"seed":$seed}"""))))
    Files.write(dir.resolve("expA.emd"), emd(2))
    Files.write(dir.resolve("expB.emd"), emd(5))
    Files.write(dir.resolve("notes.txt"), "ignored".getBytes)

    val df = spark.read.format("emd").load(dir.toString)
    assert(df.columns.toSeq == Seq("experiment_id", "path", "signal_idx",
      "title", "ndim", "shape", "data", "metadata_json"))
    assert(df.count() == 4) // 2 files x 2 signals
    assert(df.select("experiment_id").distinct().count() == 2)
    // one input partition per container file
    assert(df.rdd.getNumPartitions == 2)

    // downstream engine ops compose directly on the scan
    val cube = graft.signals.Signals.explodeCube(
      graft.signals.Signals.firstWithNdimPerExperiment(df, 3))
    assert(cube.count() == 24) // 2 experiments x 2x2x3
    val meta = df.filter(col("title") === "SpectrumImage/eds")
      .select(get_json_object(col("metadata_json"), "$.seed").cast("int").as("seed"))
      .collect().map(_.getInt(0)).sorted
    assert(meta.toSeq == Seq(2, 5))

    // column pruning: a narrow projection must not error and stays cheap
    val ids = spark.read.format("emd").load(dir.toString)
      .select("experiment_id", "signal_idx").collect()
    assert(ids.length == 4)
  }

  test("pushdown: experiment_id filters prune FILES at planning time") {
    val dir = Files.createTempDirectory("graft-emd-prune")
    def emd(seed: Int) = Hdf5TestWriter.emd(Seq(
      Hdf5TestWriter.Sig("Image", "img", Seq(2L, 2L, 1L),
        (0 until 4).map(i => (i * seed).toDouble))))
    Seq("expA", "expB", "expC").zipWithIndex.foreach { case (n, i) =>
      Files.write(dir.resolve(s"$n.emd"), emd(i + 2))
    }
    def partitionsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }.head

    val all = spark.read.format("emd").load(dir.toString)
    assert(partitionsOf(all.select("experiment_id")) == 3)

    val one = all.filter(col("experiment_id") === "expB")
    assert(partitionsOf(one) == 1) // two files never scheduled
    assert(one.count() == 1)

    val pre = all.filter(col("experiment_id").startsWith("expC"))
    assert(partitionsOf(pre) == 1)
    assert(pre.select("signal_idx").collect().map(_.getInt(0)).toSeq == Seq(0))

    // row-level pushdown on light columns composes with file pruning and
    // stays correct (filters are re-applied above the scan)
    val row = all.filter(col("signal_idx") >= 0 && col("ndim") === 2 &&
      col("experiment_id").isin("expA", "expC"))
    assert(partitionsOf(row) == 2)
    assert(row.count() == 2)

    // the plan advertises what was pushed
    val planText = one.queryExecution.executedPlan.toString
    assert(planText.contains("PushedFilters") &&
      planText.contains("experiment_id"))

    // pushed limit is local-only; global semantics intact
    assert(all.limit(2).count() == 2)
    assert(all.orderBy("experiment_id", "signal_idx").limit(5).count() == 3)
  }

  // A nonexistent load path must fail by name, not plan an empty scan: the
  // old walk returned zero files for a typo'd (or non-local hdfs://) path
  // and the query silently read as "no signals".
  test("nonexistent path fails by name instead of an empty scan") {
    val e = intercept[Exception] {
      spark.read.format("emd").load("/no/such/emd/dir").count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("does not exist"))), e.toString)
  }
}
