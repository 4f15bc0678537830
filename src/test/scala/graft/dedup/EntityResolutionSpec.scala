package graft.dedup

import graft.SparkSpec
import graft.core.Tables

class EntityResolutionSpec extends SparkSpec {

  test("er1: planted variants resolve to their original, nothing else merges") {
    val rows = DedupQueries.er1EntityResolution.fn(spark, sf).collect()
    val byId = rows.map(r => r.getAs[Long]("entity_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_dup"))).toMap
    val nCust = Tables.load(spark, sf, "customer").count()
    val planted = byId.keys.filter(_ >= 10000000L)
    assert(planted.nonEmpty)
    // recall: every planted variant clusters onto its source customer
    planted.foreach { vid =>
      val src = vid - 10000000L
      assert(byId(vid)._1 == src, s"variant $vid not linked to $src")
      assert(byId(vid)._2, s"variant $vid not flagged dup")
      assert(byId(src)._1 == src, s"original $src lost canonical id")
    }
    // precision: no unplanted entity is merged anywhere
    byId.foreach { case (id, (cluster, dup)) =>
      if (id < 10000000L) assert(cluster == id && !dup, s"false merge on $id")
    }
    assert(rows.length == nCust + planted.size)
  }
}
