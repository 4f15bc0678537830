package graft.config

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Config + path-mapping tests (FIXTURES F7): YAML-subset parse and the
  * reference's basename-only endpoint rebasing.
  */
class FlowConfigSpec extends SparkSpec {

  private val yaml =
    """# macbook → polaris compute
      |local_globus_endpoint:
      |  endpoint_id: "aaaa-1111"
      |  rel_path: /watched
      |  abs_path: /Users/sci/watched
      |remote_globus_endpoint:
      |  endpoint_id: bbbb-2222
      |  rel_path: /eagle/proj/in
      |  abs_path: /eagle/proj/in
      |remote_funcx_endpoint: cccc-3333
      |remote_funcx_endpoint_non_compute: dddd-4444
      |globus_search_index: idx-5555
      |yolo_model_path: /eagle/proj/best.pt
      |""".stripMargin

  test("parseYaml: nested endpoints, scalars, optional field, comments") {
    val c = FlowConfig.parseYaml(yaml)
    assert(c.local_globus_endpoint == Endpoint("aaaa-1111", "/watched", "/Users/sci/watched"))
    assert(c.remote_globus_endpoint.endpoint_id == "bbbb-2222")
    assert(c.remote_funcx_endpoint == "cccc-3333")
    assert(c.globus_search_index == "idx-5555")
    assert(c.yolo_model_path.contains("/eagle/proj/best.pt"))
    val noYolo = FlowConfig.parseYaml(yaml.replace("yolo_model_path: /eagle/proj/best.pt\n", ""))
    assert(noYolo.yolo_model_path.isEmpty)
  }

  test("path mapping uses basename only (utils.py semantics)") {
    val ep = Endpoint("id", "/watched/", "/abs/watched")
    assert(PathMapping.toRelative("/somewhere/else/run1.emd", ep) == "/watched/run1.emd")
    assert(PathMapping.toAbsolute("deep/dir/run1.emd", ep) == "/abs/watched/run1.emd")
  }

  test("column-level mapping and sidecar suffix swap") {
    val session = spark
    import session.implicits._
    val ep = Endpoint("id", "/rel", "/abs")
    val df = Seq("/data/deep/x.emd").toDF("path").select(
      PathMapping.toRelativeCol(col("path"), ep).as("rel"),
      PathMapping.toAbsoluteCol(col("path"), ep).as("abs"),
      PathMapping.sidecar(col("path"), ".json").as("json"),
      PathMapping.sidecar(col("path"), ".png").as("png"))
    val r = df.collect()(0)
    assert(r.getString(0) == "/rel/x.emd")
    assert(r.getString(1) == "/abs/x.emd")
    assert(r.getString(2) == "/data/deep/x.json")
    assert(r.getString(3) == "/data/deep/x.png")
  }

  // Sweep #6: hostile/degenerate paths. split('/') drops trailing empty
  // segments, so "/" split to an empty array and basename's `.last` threw
  // — a single hostile manifest row crashed the whole mapping projection.
  // Python's Path("/").name is "" (reference semantics).
  test("path mapping survives degenerate paths: root, trailing slash, empty") {
    val ep = Endpoint("e", "/rel", "/abs")
    assert(PathMapping.toRelative("/", ep) == "/rel/")
    assert(PathMapping.toRelative("//", ep) == "/rel/")
    assert(PathMapping.toRelative("", ep) == "/rel/")
    assert(PathMapping.toRelative("a/b/", ep) == "/rel/b")
    assert(PathMapping.toAbsolute("/", ep) == "/abs/")
  }

  test("parseYaml tolerates hostile lines: bare colons, CRLF, one-sided quotes, dup keys") {
    val cfg = FlowConfig.parseYaml(
      ": no key\r\n" +
      "remote_funcx_endpoint: first\r\n" +
      "remote_funcx_endpoint: second\r\n" + // last wins (pydantic-like)
      "globus_search_index: \"half-quoted\r\n" +
      "remote_funcx_endpoint_non_compute: http://host:8080/x # port colon\r\n")
    assert(cfg.remote_funcx_endpoint == "second")
    assert(cfg.globus_search_index == "half-quoted")
    // value keeps ITS colons; only the first separates key from value
    assert(cfg.remote_funcx_endpoint_non_compute == "http://host:8080/x")
    // absent nesting yields empty endpoints, never a crash
    assert(cfg.local_globus_endpoint == Endpoint("", "", ""))
  }
}
