package graft.core

import graft.SparkSpec
import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Round-13 latent-defect sweep #6 — converting sweep-5's remaining
  * "reviewed dry" claims into executable assertions (the EmptyInputSpec
  * method: run the claims, don't argue them). Each test names the claim
  * it executes; defects the conversion caught are fixed and pinned here
  * or in the domain spec.
  */
class Sweep6Spec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  // --- claim: "RangeJoin div-truncation bucketing is monotone, negatives
  // included" (sweep-5 dry note). Truncating `div` near zero makes bucket
  // 0 span (-bucket, bucket) — DOUBLE width — so exactness there is not
  // obvious from monotonicity alone; run it against the naive join.
  test("RangeJoin matches the naive join exactly on a negative/zero-straddling domain") {
    val intervals = Seq(
      (-10L, -2L, "a"), (-4L, 3L, "b"), (-1L, 1L, "c"), (0L, 5L, "d"),
      (-7L, -7L, "empty"), (2L, -2L, "inverted")).toDF("s", "e", "tag")
    val points = (-12L to 12L).map(p => (p, s"p$p")).toDF("p", "pid")
    val naive = intervals.filter(col("e") > col("s")).crossJoin(points)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("tag", "pid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    for (bucket <- Seq(1L, 2L, 3L, 7L, 100L)) {
      val got = RangeJoin.intervalJoin(intervals, "s", "e", points, "p", bucket)
        .select("tag", "pid").collect()
      // exactly once per qualifying pair — no dups from bucket overlap
      assert(got.length == naive.size, s"bucket=$bucket")
      assert(got.map(r => (r.getString(0), r.getString(1))).toSet == naive,
        s"bucket=$bucket")
    }
  }

  // --- claim: "TsRangePushdown idempotent" (sweep-5 dry note). The rule
  // runs in a fixed-point optimizer batch: if a second application added
  // the implied bound again, the batch would loop to maxIterations and
  // the filter would accrete duplicate conjuncts.
  test("TsRangePushdown is a fixed point after one application") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.dsl.plans._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val ts = AttributeReference("ts", TimestampType)()
    val rel = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(ts)
    val pred = GreaterThanOrEqual(
      Multiply(UnixMicros(ts), Literal(1000L, LongType)),
      Literal(1234567L, LongType))
    val once = graft.plans.TsRangePushdown(rel.where(pred).analyze)
    val twice = graft.plans.TsRangePushdown(once)
    assert(once.sameResult(twice))
    // and the once-plan really did add exactly ONE implied conjunct
    val conjuncts = once.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }.flatMap {
      var out = Seq.empty[Expression]
      def split(e: Expression): Unit = e match {
        case And(l, r) => split(l); split(r)
        case other => out :+= other
      }
      e => { out = Seq.empty; split(e); out }
    }
    assert(conjuncts.size == 2, conjuncts.toString)
  }

  // --- claim: "GraphQueries safe on empty/singleton graphs" (sweep-5 dry
  // note). Run pagerank/docGraph on both degenerate shapes.
  test("pagerank and docGraph survive empty and singleton graphs") {
    val empty = spark.range(0).select(col("id").as("doc_id"))
    assert(GraphQueries.docGraph(empty, 0L).count() == 0L)
    assert(GraphQueries.pagerank(empty,
      GraphQueries.docGraph(empty, 0L), 0L).count() == 0L)

    val one = Seq(0L).toDF("doc_id")
    // singleton: every synthesized edge is a self-loop mod 1 — filtered
    assert(GraphQueries.docGraph(one, 1L).count() == 0L)
    val pr = GraphQueries.pagerank(one, GraphQueries.docGraph(one, 1L), 1L)
      .collect()
    assert(pr.length == 1)
    // no inbound mass: rank = teleport share 0.15/n
    assert(math.abs(pr(0).getDouble(1) - 0.15) < 1e-12)
  }

  // --- the q52 empty-corpus crash the conversion caught: min(doc_id) over
  // zero docs is NULL and getLong NPE'd. Run the REGISTERED queries over a
  // corpus dir with empty tables.
  test("graph queries over an EMPTY corpus dir return empty results, not crashes") {
    val dir = emptyCorpus(Seq("documents", "events"))
    assert(GraphQueries.q52BfsLevels.fn(spark, dir).count() == 0L)
    assert(GraphQueries.q33Pagerank.fn(spark, dir).count() == 0L)
    assert(GraphQueries.q39Hierarchy.fn(spark, dir).count() == 0L)
  }

  test("graph queries over a SINGLETON corpus dir") {
    val dir = singletonCorpus()
    val pr = GraphQueries.q33Pagerank.fn(spark, dir).collect()
    assert(pr.length == 1)
    val bfs = GraphQueries.q52BfsLevels.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    // one node at level 0, none unreachable
    assert(bfs == Map(-1 -> 0L, 0 -> 1L), bfs.toString)
    assert(GraphQueries.q39Hierarchy.fn(spark, dir).count() == 1L)
  }

  // --- claim: "Checks, GraftSession reviewed dry — config edges hold"
  // (sweep-5 dry note). The Checks edges live in ChecksSpec (the backtick
  // regex defect this conversion caught, and zero-column Unique); the
  // session edge is here.
  test("GraftSession.local rejects a non-positive core count by name") {
    val e = intercept[IllegalArgumentException](GraftSession.local(0))
    assert(e.getMessage.contains("cores"))
    val e2 = intercept[IllegalArgumentException](GraftSession.local(-4))
    assert(e2.getMessage.contains("cores"))
  }

  /** Corpus dir holding ZERO-row copies (schema preserved) of the named
    * harness tables. */
  private def emptyCorpus(tables: Seq[String]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sweep6-empty")
      .toString
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  /** Corpus dir with exactly one document row (and its events slice). */
  private def singletonCorpus(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sweep6-one")
      .toString
    spark.read.parquet(s"$sf/documents.parquet").limit(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.read.parquet(s"$sf/events.parquet").limit(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }
}
