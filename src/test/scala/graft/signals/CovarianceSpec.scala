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

  test("g9: the power-iteration direction is a near-eigenvector of C") {
    val rows = SignalQueries.g8Covariance.fn(spark, sf).collect()
    val c = Array.ofDim[Double](8, 8)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      c(i)(j) = r.getAs[Double]("cov"); c(j)(i) = r.getAs[Double]("cov")
    }
    val w = SignalQueries.powerIteration(c)
    val cw = Array.tabulate(8)(i => (0 until 8).map(j => c(i)(j) * w(j)).sum)
    val cos = {
      val dot = (0 until 8).map(i => cw(i) * w(i)).sum
      val n1 = math.sqrt((0 until 8).map(i => cw(i) * cw(i)).sum)
      val n2 = math.sqrt((0 until 8).map(i => w(i) * w(i)).sum)
      math.abs(dot) / (n1 * n2)
    }
    assert(cos > 0.99, s"not converged: cos(Cw, w) = $cos")
    // its Rayleigh quotient dominates every coordinate direction
    val rayleigh = (0 until 8).map(i => cw(i) * w(i)).sum /
      (0 until 8).map(i => w(i) * w(i)).sum
    val maxDiag = (0 until 8).map(i => c(i)(i)).max
    assert(rayleigh >= maxDiag * 0.99,
      s"rayleigh $rayleigh below max variance $maxDiag")
    // and the registered top-10 is strictly ordered
    val top = SignalQueries.g9PcaProjection.fn(spark, sf).collect()
    assert(top.length == 10)
    top.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("p") >= b.getAs[Double]("p"))
      case _ =>
    }
  }
}
