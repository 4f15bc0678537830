package graft.flows

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class BottleneckSpec extends SparkSpec {

  test("f9: one bottleneck per multi-event user, shares bounded by 1") {
    val rows = FlowQueries.f9Bottleneck.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val usersWithGaps = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == usersWithGaps)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(shareSum > 0.0 && shareSum <= 1.0 + 1e-12,
      s"bottleneck shares sum to $shareSum")
    rows.foreach(r => assert(r.getAs[Long]("us_sum") > 0L))
  }
}
