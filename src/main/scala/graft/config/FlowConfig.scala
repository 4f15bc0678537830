package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pipeline configuration (SURVEY §1.1 Config row, FIXTURES F7) — the Spark
  * re-expression of the reference's pydantic YAML models
  * (/root/reference/picoprobe/utils.py:21-43,
  * examples/hyperspectral_flow/main.py:36-41) and endpoint path mapping
  * (utils.py:45-77).
  */
final case class Endpoint(endpoint_id: String, rel_path: String, abs_path: String)

final case class FlowConfig(
    local_globus_endpoint: Endpoint,
    remote_globus_endpoint: Endpoint,
    remote_funcx_endpoint: String,
    remote_funcx_endpoint_non_compute: String,
    globus_search_index: String,
    yolo_model_path: Option[String] = None)

object FlowConfig {

  /** Parse the reference's config-YAML subset (top-level scalars + one
    * nesting level of scalars — the exact shape of
    * examples/ * /config/ *.yaml). No external YAML dependency: the build
    * has zero extra deps, and the grammar the reference actually uses fits
    * in a screen of code. Unknown keys are ignored, like pydantic defaults.
    */
  def parseYaml(text: String): FlowConfig = {
    val root = scala.collection.mutable.Map[String, String]()
    val nested = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    var current: Option[String] = None
    text.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val line = noComment.trim
        val idx = line.indexOf(':')
        if (idx > 0) {
          val k = line.substring(0, idx).trim
          val v = line.substring(idx + 1).trim.stripPrefix("\"").stripSuffix("\"")
          if (!indented) {
            if (v.isEmpty) { current = Some(k); nested.getOrElseUpdate(k, scala.collection.mutable.Map()) }
            else { current = None; root(k) = v }
          } else current.foreach(c => nested.getOrElseUpdate(c, scala.collection.mutable.Map())(k) = v)
        }
      }
    }
    def ep(name: String): Endpoint = {
      val m = nested.getOrElse(name, scala.collection.mutable.Map())
      Endpoint(m.getOrElse("endpoint_id", ""), m.getOrElse("rel_path", ""),
        m.getOrElse("abs_path", ""))
    }
    FlowConfig(
      local_globus_endpoint = ep("local_globus_endpoint"),
      remote_globus_endpoint = ep("remote_globus_endpoint"),
      remote_funcx_endpoint = root.getOrElse("remote_funcx_endpoint", ""),
      remote_funcx_endpoint_non_compute = root.getOrElse("remote_funcx_endpoint_non_compute", ""),
      globus_search_index = root.getOrElse("globus_search_index", ""),
      yolo_model_path = root.get("yolo_model_path"))
  }
}

/** Endpoint path mapping + sidecar naming (SURVEY §2 B8). The reference
  * maps by BASENAME only (`Path(path).name`, utils.py:45-77) — a file's
  * directory is discarded when rebasing onto an endpoint.
  */
object PathMapping {

  // lastOption: split drops trailing empty segments, so "/" (and "//")
  // split to an EMPTY array — `.last` threw on exactly the degenerate
  // path a hostile manifest row can carry. Python's Path("/").name is ""
  // (the reference semantics); match it.
  private def basename(path: String): String =
    path.split('/').lastOption.getOrElse("")

  /** Driver-side mapping for single paths (config plumbing). */
  def toRelative(path: String, ep: Endpoint): String =
    s"${ep.rel_path.stripSuffix("/")}/${basename(path)}"
  def toAbsolute(path: String, ep: Endpoint): String =
    s"${ep.abs_path.stripSuffix("/")}/${basename(path)}"

  /** Column-level variants — the same mapping as a codegen'd projection
    * for applying endpoint rebasing across a whole file table.
    */
  def toRelativeCol(path: Column, ep: Endpoint): Column =
    concat_ws("/", lit(ep.rel_path.stripSuffix("/")), element_at(split(path, "/"), -1))
  def toAbsoluteCol(path: Column, ep: Endpoint): Column =
    concat_ws("/", lit(ep.abs_path.stripSuffix("/")), element_at(split(path, "/"), -1))

  /** Sidecar artifact path: swap the extension (`.emd` → `.json`/`.png`/
    * `.mp4`, hyperspectral.py:127,139).
    */
  def sidecar(path: Column, newExt: String): Column =
    concat(regexp_replace(path, "\\.[^./]+$", ""), lit(newExt))
}
