package graft.multimodal

import graft.SparkSpec

/** m5: the planted hard cut (salt shift at frame n/2) must dominate the
  * successive-frame deltas despite JPEG loss — the detector points at
  * the planted frame for every video.
  */
class SceneCutsSpec extends SparkSpec {

  test("planted cut detected at frame n/2 in every video") {
    val rows = MultimodalQueries.m5SceneCuts.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nFrames, cutFrame, maxDiff) =>
      val n = (id % 6 + 4).toInt
      assert(nFrames == n)
      assert(cutFrame == n / 2,
        s"video $id: cut at $cutFrame, planted at ${n / 2} (maxDiff $maxDiff)")
      assert(maxDiff > 0)
    }
  }

  test("m5/m7 plans: one hash exchange — the decode lineage never forks") {
    // windows + collapse all share the doc_id hash partitioning; the only
    // other exchange is the final presentation ORDER BY (range). A second
    // hash exchange (or a join) would mean the video decode re-runs.
    Seq(MultimodalQueries.m5SceneCuts, MultimodalQueries.m7Keyframes)
      .foreach { q =>
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(hashEx == 1, s"${q.name}: $hashEx hash exchanges\n$plan")
        assert(!plan.contains("Join"), s"${q.name} plan contains a join")
      }
  }
}
