package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MadAnomalySpec extends SparkSpec {

  /** Brute-force local median over half-cent ints: midpoint of the two
    * middle order statistics — the definition the distributed rank path
    * must reproduce bit-for-bit. */
  private def medLocal(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    (s((n - 1) / 2) + s(n / 2)) / 2
  }

  test("q57: distributed MAD equals the local definition exactly") {
    val got = EventQueries.q57MadAnomaly.fn(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        (graft.core.Exact.money(col("value")) * 200).cast("long").as("c2"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("c2").toDouble) }
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = ev(t)
      val med2 = medLocal(xs)
      val mad2 = medLocal(xs.map(x => math.abs(x - med2)))
      assert(r.getAs[Long]("n") == xs.length)
      assert(r.getAs[Double]("med") == med2 / 200.0, s"med mismatch for $t")
      assert(r.getAs[Double]("mad") == mad2 / 200.0, s"mad mismatch for $t")
      val expAnom = xs.count(x => math.abs(x - med2) > 3.0 * mad2)
      assert(r.getAs[Long]("n_anomalies") == expAnom.toLong)
    }
  }
}
