package graft.sim

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions.col

/** s10: the distributed PQ train → encode → ADC pipeline must equal a
  * straight-line driver replay (same integer arithmetic, same fixed-order
  * 8-term ADC sum).
  */
class PqSpec extends SparkSpec {

  test("s10: PQ ADC top-5 equals driver-side replay") {
    val out = SimilarityQueries.s10PqAdc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 64.0).toLong).toArray))
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def subOf(v: Array[Long], s: Int): Array[Long] = v.slice(s * 8, s * 8 + 8)

    // codebooks: per subspace, 4 seeds + one rational-Lloyd iteration
    val codebooks: Array[Seq[(Long, Array[Long], Long)]] =
      Array.tabulate(8) { s =>
        val c0 = vecs.take(4).zipWithIndex
          .map { case ((_, v), i) => (i.toLong, subOf(v, s), 1L) }.toSeq
        def assign(cents: Seq[(Long, Array[Long], Long)]) =
          vecs.map { case (id, v) =>
            val x = subOf(v, s); val xx = dot(x, x)
            id -> cents.map { case (cid, sv, n) =>
              (n * n * xx - 2L * n * dot(x, sv) + dot(sv, sv), cid) }.min._2
          }
        val a1 = assign(c0).toMap
        a1.groupBy(_._2).toSeq.map { case (cid, m) =>
          val xs = m.keys.toSeq.sorted
            .map(id => subOf(vecs.find(_._1 == id).get._2, s))
          (cid, xs.transpose.map(_.sum).toArray, xs.size.toLong)
        }.sortBy(_._1)
      }
    // encode + per-query centroid distance tables, then fixed-order ADC
    def code(v: Array[Long], s: Int): Long = {
      val x = subOf(v, s); val xx = dot(x, x)
      codebooks(s).map { case (cid, sv, n) =>
        (n * n * xx - 2L * n * dot(x, sv) + dot(sv, sv), cid) }.min._2
    }
    val queries = vecs.filter(_._1 < 10)
    val expect = queries.flatMap { case (qid, qv) =>
      val dt = Array.tabulate(8) { s =>
        val x = subOf(qv, s); val xx = dot(x, x)
        codebooks(s).map { case (cid, sv, n) =>
          cid -> ((n * n * xx - 2L * n * dot(x, sv) + dot(sv, sv)).toDouble /
            (n * n).toDouble) }.toMap
      }
      vecs.filter(_._1 != qid).map { case (nid, nv) =>
        val dist = (0 until 8).map(s => dt(s)(code(nv, s))).reduce(_ + _)
        (qid, nid, dist)
      }.sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((_, nid, d), i) => (qid, i + 1, nid, d) }
    }
    assert(out.toSeq == expect.toSeq)
  }
}
