package graft.sources

import graft.SparkSpec
import graft.flows.{FlowRun, StepOutput}

/** Marker-pagination semantics (SURVEY §2 A6) against a fake cursor API:
  * page following, limit cutoff mid-stream, post-filter truncation, and
  * the hand-off into a distributed Dataset.
  */
class PaginatedSpec extends SparkSpec {

  // fake paged source: pages "0" → "1" → "2", 3 items each, tracking calls
  private class FakeApi(statuses: Seq[String]) {
    var calls: Vector[Option[String]] = Vector.empty
    private val pages: Seq[Seq[Int]] = statuses.indices.grouped(3).toSeq
    def fetch(marker: Option[String]): Paginated.Page[FlowRun] = {
      calls :+= marker
      val idx = marker.map(_.toInt).getOrElse(0)
      val items = pages(idx).map(i => run(s"r$i", statuses(i)))
      Paginated.Page(items,
        if (idx + 1 < pages.size) Some((idx + 1).toString) else None)
    }
  }

  private def run(id: String, status: String) = FlowRun(
    run_id = id, action_id = s"a_$id", flow_id = "f", status = status,
    start_time = "2023-10-01T00:00:00+00:00",
    completion_time = "2023-10-01T00:01:00+00:00",
    output = Map("s" -> StepOutput(s"a_$id", "s", "OK",
      "2023-10-01T00:00:00+00:00", "2023-10-01T00:01:00+00:00")))

  test("fetchAll follows markers to exhaustion") {
    val api = new FakeApi(Seq.fill(9)("SUCCEEDED"))
    val all = Paginated.fetchAll()(api.fetch)
    assert(all.size == 9)
    assert(api.calls == Vector(None, Some("1"), Some("2")))
  }

  test("fetchAll stops paging once the limit is covered") {
    val api = new FakeApi(Seq.fill(9)("SUCCEEDED"))
    val got = Paginated.fetchAll(limit = 4)(api.fetch)
    assert(got.size == 6)                      // whole pages, like the reference
    assert(api.calls == Vector(None, Some("1"))) // page 3 never fetched
  }

  test("fetchAll fails by name on a stuck cursor instead of spinning forever") {
    // a server echoing the marker back with an empty page makes no
    // progress — round-12 sweep: this looped until driver OOM
    val ex = intercept[IllegalStateException] {
      Paginated.fetchAll[String]() {
        case None => Paginated.Page(Seq("a"), Some("stuck"))
        case Some(m) => Paginated.Page(Seq.empty, Some(m))
      }
    }
    assert(ex.getMessage.contains("no progress"))
  }

  test("an empty page with a FRESH marker still advances (sparse cursor APIs)") {
    val got = Paginated.fetchAll[String]() {
      case None => Paginated.Page(Seq("a"), Some("p1"))
      case Some("p1") => Paginated.Page(Seq.empty, Some("p2")) // legal skip
      case Some("p2") => Paginated.Page(Seq("b"), None)
      case other => fail(s"unexpected cursor $other")
    }
    assert(got == Seq("a", "b"))
  }

  test("flowRuns filters SUCCEEDED then truncates to limit") {
    val statuses = Seq("SUCCEEDED", "FAILED", "SUCCEEDED",
      "SUCCEEDED", "FAILED", "SUCCEEDED", "SUCCEEDED", "FAILED", "SUCCEEDED")
    val api = new FakeApi(statuses)
    val ds = Paginated.flowRuns(spark, limit = 4)(api.fetch)
    val ids = ds.collect().map(_.run_id).toSeq
    // 9 fetched (limit counts raw rows), 6 SUCCEEDED, first 4 kept
    assert(ids == Seq("r0", "r2", "r3", "r5"))
    // and the result is a real distributed Dataset usable downstream
    assert(graft.flows.FlowAnalyzer.timingData(ds.toDF()).count() == 4)
  }
}
