package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {

  test("q59: dense spine, observed rows exact, gaps bounded by neighbors") {
    val rows = EventQueries.q59GapFill.fn(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // every user carries the identical dense hour spine
    val spineLens = byUser.values.map(_.length).toSet
    assert(spineLens.size == 1)
    byUser.values.foreach { rs =>
      val ordered = rs.sortBy(_.getAs[Long]("hr"))
      assert(ordered.map(_.getAs[Long]("hr")).toSeq ==
        (ordered.head.getAs[Long]("hr") to ordered.last.getAs[Long]("hr")))
      // interpolated values lie within their bracketing observations
      val obsIdx = ordered.zipWithIndex
        .filter(_._1.getAs[String]("src") == "obs").map(_._2)
      assert(obsIdx.nonEmpty)
      ordered.zipWithIndex.foreach { case (r, i) =>
        r.getAs[String]("src") match {
          case "interp" =>
            val prev = obsIdx.filter(_ < i).max
            val next = obsIdx.filter(_ > i).min
            val lo = math.min(ordered(prev).getAs[Double]("cents_filled"),
              ordered(next).getAs[Double]("cents_filled"))
            val hi = math.max(ordered(prev).getAs[Double]("cents_filled"),
              ordered(next).getAs[Double]("cents_filled"))
            val v = r.getAs[Double]("cents_filled")
            assert(v >= lo && v <= hi, s"interp $v outside [$lo,$hi]")
          case "ffill" => assert(obsIdx.forall(_ < i))
          case "bfill" => assert(obsIdx.forall(_ > i))
          case "obs" =>
        }
      }
    }
    // observed rows carry the exact per-hour max-cents reading
    val want = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), expr("ts div 3600000000000").as("hr"))
      .agg(max((graft.core.Exact.money(col("value")) * 100).cast("long"))
        .as("c")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("hr")) ->
        r.getAs[Long]("c").toDouble).toMap
    rows.filter(_.getAs[String]("src") == "obs").foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Long]("hr"))
      assert(r.getAs[Double]("cents_filled") == want(k))
    }
  }
}
