package graft.signals

import graft.SparkSpec

class CovarianceSpec extends SparkSpec {

  test("g8: diagonal is nonnegative and Cauchy-Schwarz bounds every pair") {
    val rows = SignalQueries.g8Covariance.fn(spark, sf).collect()
    assert(rows.length == 36) // 8 channels, i <= j
    val cov = rows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
      r.getAs[Double]("cov")).toMap
    (0 until 8).foreach(i => assert(cov((i, i)) >= 0.0))
    for { i <- 0 until 8; j <- i + 1 until 8 } {
      val bound = math.sqrt(cov((i, i)) * cov((j, j)))
      assert(math.abs(cov((i, j))) <= bound + 1e-9,
        s"CS violated at ($i,$j): ${cov((i, j))} vs $bound")
    }
  }
}
