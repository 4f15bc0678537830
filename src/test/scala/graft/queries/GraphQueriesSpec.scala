package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** PageRank invariants: probability-mass conservation (minus defined
  * losses) and bit-exact partitioning independence of the integer-scaled
  * iteration.
  */
class GraphQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("rank mass stays near 1 (floor + dangling losses only)") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id")
    val n = docs.count()
    val pr = GraphQueries.pagerank(docs, GraphQueries.docGraph(docs, n), n)
    val total = pr.agg(sum("pr")).head().getDouble(0)
    // per-iteration losses are bounded: floor drops < 1e-15 per edge,
    // dangling nodes (none in this graph: every doc has out-edges) drop 0
    assert(math.abs(total - 1.0) < 1e-6, s"mass $total")
  }

  test("ranks are bit-identical on any partitioning") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id")
    val n = docs.count()
    val g = GraphQueries.docGraph(docs, n)
    def run(parts: Int): Map[Long, Double] =
      GraphQueries.pagerank(docs.repartition(parts), g.repartition(parts), n)
        .as[(Long, Double)].collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(b(k)), s"doc $k: $v vs ${b(k)}")
    }
  }

  test("q39 keeps users whose ancestors are not users (non-contiguous ids)") {
    // ancestors of node 201 (user 200) are 100, 50, 25, 12, 6, 3, 1 — none
    // derived from this user set; before the closure fix the doubling
    // join dropped such users silently (round-3 advisory)
    val dir = java.nio.file.Files.createTempDirectory("graft-q39").toString
    Seq(3L, 8L, 200L).toDF("user_id")
      .write.parquet(s"$dir/events.parquet")
    val got = GraphQueries.q39Hierarchy.fn(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    def walk(u: Long): (Long, Long, Long) = {
      var cur = u + 1; var d = 0L
      while (cur > 1) { cur /= 2; d += 1 }
      (u, 1L, d)
    }
    assert(got == Set(3L, 8L, 200L).map(walk), got)
  }

  test("hub nodes with many in-links outrank leaf nodes") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id")
    val n = docs.count()
    val g = GraphQueries.docGraph(docs, n)
    val indeg = g.groupBy("dst").agg(count(lit(1)).as("ind"))
    val joined = GraphQueries.pagerank(docs, g, n)
      .join(indeg, col("doc_id") === col("dst"), "left")
      .select(col("doc_id"), col("pr"), coalesce(col("ind"), lit(0L)).as("ind"))
    val avgByDeg = joined.groupBy("ind").agg(avg("pr").as("mean_pr"))
      .orderBy("ind").as[(Long, Double)].collect()
    // mean rank should increase with in-degree
    assert(avgByDeg.length >= 2)
    assert(avgByDeg.last._2 > avgByDeg.head._2)
  }

  test("q52: level histogram equals a driver-side BFS") {
    val out = GraphQueries.q52BfsLevels.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val docs = Tables.load(spark, sf, "documents").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val n = docs.length.toLong
    // mirror docGraph exactly: dst is the modular image, NOT filtered to
    // existing ids (harness ids are contiguous so the two coincide)
    val adj = docs.flatMap(d => Seq((d, (d * 31 + 7) % n),
        (d, (d * 17 + 3) % n), (d, (d * 13 + 11) % n)))
      .filter { case (a, b) => a != b }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dist = scala.collection.mutable.Map(docs.head -> 0)
    var frontier = Set(docs.head)
    (1 to 4).foreach { k =>
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = k)
    }
    val expect = ((-1, n - dist.size) +:
      dist.values.groupBy(identity).toSeq
        .map { case (l, vs) => (l, vs.size.toLong) }).sortBy(_._1)
    assert(out.toSeq == expect)
    assert(out.map(_._2).sum == n) // levels + unreached partition the nodes
  }
}
