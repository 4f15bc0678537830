package graft.queries

import graft.SparkSpec
import graft.core.Tables

class EqualFreqBinsSpec extends SparkSpec {

  test("q58: ten bins, each holding ~a tenth of the rows") {
    val rows = RelationalQueries.q58EqualFreqBins.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    val total = Tables.load(spark, sf, "lineitem").count()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n > total / 14 && n < total / 7,
        s"bin ${r.getAs[Long]("bin")} holds $n of $total — not equal-frequency")
    }
    // bins tile the value axis: consecutive [mn, mx] ranges don't overlap
    rows.sortBy(_.getAs[Long]("bin")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("mx") <= b.getAs[Double]("mn"))
      case _ =>
    }
  }
}
