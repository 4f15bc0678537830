package graft.sources

import org.apache.spark.sql.DataFrame

/** EMD (electron-microscopy HDF5 container, Velox layout) signal listing —
  * the engine's real ingestion for the reference's `hs.load` call
  * (/root/reference/picoprobe/tools/hyperspectral.py:51-66,
  * tools/temporal.py:72, tools/gather_metadata.py:28).
  *
  * Layout walked: `/Data/<kind>/<uid>/Data` datasets (kind = Image,
  * SpectrumImage, …), with the sidecar `Metadata` dataset (uint8 JSON
  * text, NUL-padded) when present. Signals are enumerated in
  * (kind, uid) name order, and singleton axes are squeezed — matching the
  * loader behavior the reference relies on, where a single-frame (h, w, 1)
  * image presents as 2-D and a spectrum cube as 3-D, so "first signal
  * with ndim == 3" picks the hyperspectral cube.
  */
object Emd {

  final case class EmdSignal(
      signal_idx: Int,
      title: String,
      ndim: Int,
      shape: Seq[Int],
      data: Seq[Double],
      metadata_json: String)

  /** All signals of one container, in deterministic (kind, uid) order. */
  def signals(bytes: Array[Byte]): Seq[EmdSignal] = {
    val root = Hdf5.open(bytes)
    val dataGroup = root.child("Data") match {
      case Some(g: Hdf5.Group) => g
      case _ => return Seq.empty
    }
    val found = for {
      kind <- dataGroup.groups.sortBy(_.name)
      uid <- kind.groups.sortBy(_.name)
      ds <- uid.datasets.find(_.name == "Data").toSeq
    } yield {
      val squeezed = ds.dims.filter(_ > 1L).map(_.toInt)
      val meta = uid.datasets.find(_.name == "Metadata")
        .map(metadataJson).getOrElse("{}")
      (s"${kind.name}/${uid.name}", squeezed, ds.readDoubles().toSeq, meta)
    }
    found.zipWithIndex.map { case ((title, shape, data, meta), idx) =>
      EmdSignal(idx, title, shape.length, shape, data, meta)
    }
  }

  /** Velox metadata datasets are uint8 JSON text, either 1-D or 2-D
    * (bytes × frames, every frame a NUL-padded copy) — decode frame 0.
    */
  private def metadataJson(ds: Hdf5.Dataset): String = {
    val raw = ds.readBytes()
    val bytes = ds.dims match {
      case Vector(_, frames) if frames > 1 =>
        // row-major (n, frames): frame 0 is every frames-th byte
        val n = ds.dims(0).toInt
        Array.tabulate(n)(i => raw(i * frames.toInt))
      case _ => raw
    }
    val end = bytes.indexOf(0.toByte) match { case -1 => bytes.length; case i => i }
    new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Distributed parse for the streaming pipelines: file rows
    * `(experiment_id, path, content)` → one row per contained signal in
    * the engine's signal-table layout (FIXTURES F1). Parsing is plain
    * executor-local JVM work inside `flatMap` — files distribute across
    * the cluster and no array leaves its executor un-aggregated.
    */
  def parseFiles(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.selectExpr("experiment_id", "path", "content")
      .as[(String, String, Array[Byte])]
      .flatMap { case (eid, path, content) =>
        signals(content).map(s =>
          (eid, path, s.signal_idx, s.title, s.ndim, s.shape, s.data, s.metadata_json))
      }
      .toDF("experiment_id", "path", "signal_idx", "title", "ndim", "shape",
        "data", "metadata_json")
  }
}
