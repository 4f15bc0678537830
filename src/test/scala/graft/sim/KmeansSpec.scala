package graft.sim

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions.col

/** s9: the distributed 2-iteration quantized Lloyd trajectory must equal a
  * straight-line driver recompute (integer arithmetic end to end).
  */
class KmeansSpec extends SparkSpec {

  test("s9: distributed assignment equals driver-side brute force") {
    val out = SimilarityQueries.s9Kmeans.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 64.0).toLong).toArray))
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val byId = vecs.toMap // no id-contiguity assumption
    var cents: Seq[(Long, Array[Long], Long)] =
      vecs.take(8).zipWithIndex.map { case ((_, v), i) => (i.toLong, v, 1L) }
    var assigned: Map[Long, Long] = Map.empty
    (1 to 2).foreach { _ =>
      assigned = vecs.map { case (id, x) =>
        val xx = dot(x, x)
        val best = cents.map { case (cid, sv, n) =>
          (n * n * xx - 2L * n * dot(x, sv) + dot(sv, sv), cid)
        }.min
        id -> best._2
      }.toMap
      cents = assigned.groupBy(_._2).toSeq.map { case (cid, members) =>
        val xs = members.keys.toSeq.sorted.map(byId)
        val sv = xs.transpose.map(_.sum).toArray
        (cid, sv, xs.size.toLong)
      }.sortBy(_._1)
    }
    val expect = assigned.groupBy(_._2).toSeq.map { case (cid, m) =>
      val sumXx = m.keys.toSeq.sorted
        .map(id => { val v = byId(id); dot(v, v) }).sum
      (cid, m.size.toLong, sumXx)
    }.sortBy(_._1)
    assert(out.toSeq == expect)
    assert(out.map(_._2).sum == vecs.length) // clusters partition the corpus
  }
}
