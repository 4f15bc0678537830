package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Approximate-quantile study — the scale path next to q31's exact rank
  * interpolation: `percentile_approx` (Greenwald-Khanna-style mergeable
  * summary) trades the rank shuffle-and-sort for per-partition summaries
  * whose state is O(accuracy), at a DOCUMENTED rank-error guarantee of
  * n/accuracy. Exact quantiles stay the oracle-able default (q31:
  * deterministic, bit-identical cross-engine); the sketch is what a
  * 100 TB interactive profile uses — this spec pins the error contract
  * that choice relies on, per group, and that error tightens as the
  * accuracy parameter grows.
  */
class QuantileStudySpec extends SparkSpec {

  import spark.implicits._

  test("study: percentile_approx rank error is within n/accuracy per group") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))

    def rankError(accuracy: Int): Map[String, Double] = {
      val approx = li.groupBy("g")
        .agg(percentile_approx(col("v"), lit(0.5), lit(accuracy)).as("p50"))
      li.join(approx, Seq("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") <= col("p50"), 1L).otherwise(0L)).as("rank_at"))
        .select(col("g"),
          abs(col("rank_at").cast("double") / col("n") - 0.5).as("rank_err"))
        .as[(String, Double)].collect().toMap
    }

    val coarse = rankError(25)
    val fine = rankError(10000)
    coarse.foreach { case (g, err) =>
      assert(err <= 1.0 / 25 + 1e-9, s"group $g coarse rank error $err > 1/25")
    }
    fine.foreach { case (g, err) =>
      assert(err <= 1.0 / 10000 + 1e-3, s"group $g fine rank error $err")
    }
    // more state → no worse aggregate error
    assert(fine.values.sum <= coarse.values.sum + 1e-9,
      s"fine ${fine.values.sum} vs coarse ${coarse.values.sum}")
  }
}
