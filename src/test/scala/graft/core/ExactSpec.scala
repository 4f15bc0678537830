package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The split-long exact-sum accumulator (r10): bit-equality against the
  * wide Decimal(30,4) path, partitioning invariance, null semantics,
  * negative-value correctness (the truncating div/% identity), the
  * two-phase partial/merge contract, and the LOUD out-of-envelope
  * failure under ANSI.
  */
class ExactSpec extends SparkSpec {

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  test("dsum == wide decimal path, bit for bit, including negatives") {
    val session = spark
    import session.implicits._
    // adversarial grid: mixed signs, many decimal widths, values whose
    // double representation is not the decimal value
    val rows = (1 to 4000).map { i =>
      val v = (i % 7 - 3) * (i * 0.01 + 1.0 / (i % 13 + 3))
      (i % 5, v)
    }
    val df = rows.toDF("g", "v")
    val a = df.groupBy("g").agg(Exact.dsum(col("v")).as("s"))
      .orderBy("g").collect().map(_.getDouble(1))
    val b = df.groupBy("g").agg(Exact.dsumWide(col("v")).as("s"))
      .orderBy("g").collect().map(_.getDouble(1))
    assert(a.length == 5)
    a.zip(b).foreach { case (x, y) => assert(bits(x) == bits(y), s"$x != $y") }
  }

  test("dsum is partitioning-independent") {
    val session = spark
    import session.implicits._
    val df = (1 to 3000).map(i => (i % 3, i * 0.037 - 40.0)).toDF("g", "v")
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(Exact.dsum(col("v")).as("s"))
        .orderBy("g").collect().map(r => bits(r.getDouble(1))).toSeq
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("null semantics: all-null group sums to null, mixed skips nulls") {
    val session = spark
    import session.implicits._
    val df = Seq((0, Some(1.25)), (0, None), (1, None), (1, None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Exact.dsum(col("v")).as("s"))
      .orderBy("g").collect()
    assert(got(0).getDouble(1) == 1.25)
    assert(got(1).isNullAt(1))
  }

  test("dsumScaled at scales 2/4/6 matches the plain decimal sum") {
    val session = spark
    import session.implicits._
    val df = (1 to 500).map(i => (i % 2, i * 1.17 - 250.0)).toDF("g", "v")
    for (sc <- Seq(2, 4, 6)) {
      val dec = col("v").cast(DecimalType(18, sc))
      val a = df.groupBy("g").agg(Exact.dsumScaled(dec, sc).as("s"))
        .orderBy("g").collect().map(_.getDouble(1))
      val b = df.groupBy("g").agg(sum(dec).cast(DoubleType).as("s"))
        .orderBy("g").collect().map(_.getDouble(1))
      a.zip(b).foreach { case (x, y) =>
        assert(bits(x) == bits(y), s"scale $sc: $x != $y")
      }
    }
  }

  test("two-phase partial+merge equals the direct sum") {
    val session = spark
    import session.implicits._
    val df = (1 to 2000).map(i => (i % 10, i % 4, i * 0.03)).toDF("a", "b", "v")
    val direct = df.groupBy("b").agg(Exact.dsum(col("v")).as("s"))
      .orderBy("b").collect().map(r => bits(r.getDouble(1))).toSeq
    val phased = df.groupBy("a", "b").agg(Exact.dsumPartial(col("v")).as("p"))
      .groupBy("b").agg(Exact.dsumMerge(col("p")).as("s"))
      .orderBy("b").collect().map(r => bits(r.getDouble(1))).toSeq
    assert(direct == phased)
  }

  test("property: dsum == dsumWide bit for bit over seeded random doubles") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val session = spark
    import session.implicits._
    val rowGen = Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(-1.0e6, 1.0e6))
    for (seed <- 0L until 3L) {
      val rows = (0 until 1500).flatMap(i =>
        rowGen.apply(Gen.Parameters.default, Seed(seed * 10000 + i)))
      val df = rows.toDF("g", "v")
      val a = df.groupBy("g").agg(Exact.dsum(col("v")).as("s"))
        .orderBy("g").collect().map(r => bits(r.getDouble(1))).toSeq
      val b = df.groupBy("g").agg(Exact.dsumWide(col("v")).as("s"))
        .orderBy("g").collect().map(r => bits(r.getDouble(1))).toSeq
      assert(a == b, s"seed $seed")
    }
  }

  test("out-of-envelope magnitudes fail loud (never a silent wrong sum)") {
    val session = spark
    import session.implicits._
    // ~1e18 per row is far past the ±9.2e14 scale-4 envelope; the wide
    // path owns these (f2/f7 sum-of-squares) — the fast path must THROW
    val df = Seq(1.0e18, 2.0e18).toDF("v")
    val e = intercept[Exception] {
      df.agg(Exact.dsum(col("v"))).collect()
    }
    def chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).toSeq
    assert(chain.exists(c => c.getMessage != null &&
      (c.getMessage.contains("CAST_OVERFLOW") ||
        c.getMessage.contains("overflow"))), e.getMessage)
    // and the wide path handles the same rows exactly
    val wide = df.agg(Exact.dsumWide(col("v"))).head.getDouble(0)
    assert(wide == 3.0e18)
  }

  test("davg on a null-bearing column equals AVG (sum over non-null count)") {
    val session = spark
    import session.implicits._
    val df = Seq(("g", Some(2.0)), ("g", None), ("g", Some(4.0)),
      ("h", Option.empty[Double]))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Exact.davg(col("v")).as("a"), avg("v").as("ref"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString))).toMap
    // group g: AVG = 3.0 (not 2.0 = sum/count(*)); group h: all-null -> NULL
    assert(got("g")._1 == got("g")._2 && got("g")._1.contains("3.0"), got.toString)
    assert(got("h")._1.isEmpty && got("h")._2.isEmpty, got.toString)
  }
}
