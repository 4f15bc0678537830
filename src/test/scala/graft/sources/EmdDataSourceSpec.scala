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
}
