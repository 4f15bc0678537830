package graft.pipelines

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** p2: the composed dedup → gate → pack manifest must equal a driver-side
  * replay of the same four stages.
  */
class MixturePackSpec extends SparkSpec {

  test("p2: manifest equals brute-force stage replay; dups are screened") {
    val out = PipelineQueries.p2MixturePack.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Tables.loadSpread(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // planted re-crawls
    val crawl = docs ++ docs.filter(_._1 % 9 == 0)
      .map { case (id, s, t) => (id + 1000000L, s, t) }
    // dedup first-wins by id (sha collision == text equality here)
    val kept = crawl.groupBy(_._3).map(_._2.minBy(_._1)).toSeq
    // originals always beat their re-crawl copy
    assert(kept.forall(_._1 < 1000000L))
    def ntok(t: String): Long = t.split(" ").count(_.nonEmpty).toLong
    def wchars(t: String): Long = t.count(_ != ' ').toLong
    val gated = kept
      .filter(d => { val n = ntok(d._3); n >= 20 && n <= 80 &&
        wchars(d._3) < n * 7 })
    assert(gated.nonEmpty && gated.size < kept.size) // the gate does work
    val expect = gated.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var acc = 0L
      ds.sortBy(_._1).map { d =>
        val bin = acc / 2048L
        acc += ntok(d._3)
        ((src, bin), ntok(d._3))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }
    assert(out == expect)
  }
}
