package graft.text

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class KeywordsSpec extends SparkSpec {

  test("t29: per-doc top-3 TF-IDF equals a driver recompute") {
    val out = TextQueries.t29Keywords.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tf = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => ((id, w), ws.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expect = tf.keys.groupBy(_._1).toSeq.flatMap { case (id, keys) =>
      keys.toSeq.map { case (_, w) =>
        val score = ((n - df(w).toDouble + 0.5) / (df(w).toDouble + 0.5)) *
          tf((id, w)).toDouble
        (w, tf((id, w)), df(w), score)
      }.sortBy(t => (-t._4, t._1)).take(3).zipWithIndex
        .map { case ((w, t, d, s), i) => (id, i + 1, w, t, d, s) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect)
    out.groupBy(_._1).values.foreach(g => assert(g.length <= 3))
  }
}
