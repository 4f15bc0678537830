package graft.expressions

import graft.SparkSpec
import graft.core.HeavyHitters
import org.apache.spark.sql.functions._

/** Count-Min aggregate + probe: never undercounts, order-independent
  * build, bounded overcount, and the sketch-prune → exact-recount
  * identity behind q32.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val W = 1 << 12
  private val D = 4

  private def gridOf(keys: Seq[Long], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .select(CountMin.cmsState(col("k"), W, D).as("g"))
      .head().getAs[Array[Byte]](0)

  // Zipf-ish planted frequencies: key i occurs i times
  private val keys: Seq[Long] = (1L to 100L).flatMap(i => Seq.fill(i.toInt)(i * 2147483647L))

  test("estimates never undercount, on any partitioning; identical state") {
    val g1 = gridOf(keys, 1)
    val g8 = gridOf(keys, 8)
    // element-wise addition is commutative: the grid is a pure function of the bag
    assert(java.util.Arrays.equals(g1, g8))
    val under = (1L to 100L).map(i => (i * 2147483647L, i)).toDF("k", "true_n")
      .select(CountMin.cmsEstimate(col("k"), g1, W, D).as("est"), col("true_n"))
      .agg(sum(when(col("est") < col("true_n"), 1).otherwise(0))).head().getLong(0)
    assert(under == 0L, "an estimate fell below the true count")
  }

  test("overcount stays near the n/width collision bound") {
    val g = gridOf(keys, 4)
    // n = 5050 rows over width 4096: expected collision mass ~1.2/cell;
    // min-over-4-rows keeps the realized error tiny
    val worst = (1L to 100L).map(i => (i * 2147483647L, i)).toDF("k", "true_n")
      .select((CountMin.cmsEstimate(col("k"), g, W, D) - col("true_n")).as("err"))
      .agg(max(col("err"))).head().getLong(0)
    assert(worst <= 20L, s"overcount $worst exceeds plausible collision bound")
  }

  test("heavy hitters via CMS prefilter equal the plain groupBy exactly") {
    val ev = graft.core.Tables.load(spark, sf, "events")
      .select(when(pmod(col("event_id"), lit(10)) < 3, pmod(col("user_id"), lit(5)))
        .otherwise(col("event_id") + 1000000L).as("k"))
    val got = HeavyHitters.exact(ev, "k", t => t / 100)
      .as[(Long, Long)].collect().toSet
    val want = ev.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") >= ev.count() / 100)
      .as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty, s"got=$got want=$want")
    // the planted-skew shape: exactly the 5 hot keys survive
    assert(want.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("the estimate probe stays inside whole-stage codegen") {
    val g = gridOf(Seq(1L, 2L, 3L), 1)
    val plan = graft.core.Tables.load(spark, sf, "lineitem")
      .filter(CountMin.cmsEstimate(xxhash64(col("l_partkey")), g, W, D) >= 2L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.linesIterator.exists(_.trim.startsWith("* Filter")), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("cms_order equals the interpreted transform/sort_array chain it replaced") {
    // documents-shaped input: per-row long arrays with skewed element
    // frequencies, plus edge rows (empty, singleton, all-equal-df ties)
    val rows = Seq(
      Seq(5L, 1L, 9L, 1L, 7L),          // dup elements (pre-dedup shape)
      Seq.empty[Long],
      Seq(42L),
      (1L to 200L).map(i => i % 7L),    // heavy ties → hash tiebreak
      (1L to 500L).map(i => i * 2654435761L)) // big row exercises quicksort
    val df = rows.toDF("sh")
    val g = df.select(explode(col("sh")).as("h"))
      .agg(CountMin.cmsState(col("h"), W, D).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    def est(h: org.apache.spark.sql.Column) = CountMin.cmsEstimate(h, g, W, D)
    val both = df.select(
      CountMin.cmsOrder(col("sh"), g, W, D).as("fused"),
      transform(
        sort_array(transform(col("sh"), h => struct(est(h).as("df"), h.as("h")))),
        _.getField("h")).as("interp"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("cms_order stays inside whole-stage codegen") {
    val g = gridOf(Seq(1L, 2L, 3L), 1)
    val plan = graft.core.Tables.load(spark, sf, "documents")
      .select(CountMin.cmsOrder(
        graft.expressions.GraftExpressions.shingleHashes(col("text"), 3),
        g, W, D).as("oh"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the leading asterisk marks a whole-stage-codegen'd operator
    assert(plan.linesIterator.exists(_.trim.startsWith("* Project")), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("cms_order fails loudly on a null array element (never fabricates hash 0)") {
    val g = gridOf(Seq(1L), 1)
    val df = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("sh")
    val err = intercept[Exception] {
      df.select(CountMin.cmsOrder(col("sh"), g, W, D)).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(err).exists(_.contains("null element")), err.toString)
  }

  test("cms_order rejects non-long arrays at analysis time") {
    val g = gridOf(Seq(1L), 1)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1, 2)).toDF("sh")
        .select(CountMin.cmsOrder(col("sh"), g, W, D)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cms_order") ||
      err.getMessage.contains("ARRAY<BIGINT>"), err.getMessage)
  }

  test("cms_state is reachable from pure SQL") {
    graft.core.Tables.load(spark, sf, "events").createOrReplaceTempView("cms_ev")
    val bytes = spark.sql(
      "SELECT cms_state(xxhash64(user_id), 1024, 4) FROM cms_ev")
      .head().getAs[Array[Byte]](0)
    assert(bytes.length == 1024 * 4 * 8)
  }
}
