package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem")

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min=${ts.min}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    val disc = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2))
    time("count only") {
      li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("sum(double)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice")), sum(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
    }
    time("sum(long)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum((col("l_extendedprice") * 100).cast("long")),
          sum((col("l_quantity") * 100).cast("long")))
        .write.format("noop").mode("overwrite").save()
    }
    time("2x sum(dec30_4)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice").cast(DecimalType(30, 4))).cast(DoubleType),
          sum(col("l_quantity").cast(DecimalType(30, 4))).cast(DoubleType))
        .write.format("noop").mode("overwrite").save()
    }
    time("2x sum(dec product)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(disc.cast(DecimalType(30, 4))).cast(DoubleType),
          sum((disc * (lit(1.0) + col("l_tax")).cast(DecimalType(18, 2)))
            .cast(DecimalType(30, 4))).cast(DoubleType))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 full") {
      graft.SparkEntry.queries("q1_agg")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // isolate per-row cast cost vs sum-buffer cost
    val x = col("l_extendedprice").cast(DecimalType(18, 2))
    time("max(dec18_2) per-row only") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(max(x), max(x * lit(2)))
        .write.format("noop").mode("overwrite").save()
    }
    // candidate: unscaled-long split sum — exact decimal per row, long sums
    val u = (col("l_extendedprice").cast(DecimalType(30, 4)) * lit(10000))
      .cast("long")
    def splitQ1(): Unit = {
      val li2 = li.withColumn("u", u).withColumn("u2", u)
      li2.groupBy("l_returnflag", "l_linestatus")
        .agg(((sum(expr("u div 1000000")).cast(DecimalType(30, 0)) * lit(1000000) +
          sum(expr("u % 1000000"))).cast(DecimalType(30, 4)) / lit(10000))
          .cast(DoubleType).as("s1"),
          ((sum(expr("u2 div 1000000")).cast(DecimalType(30, 0)) * lit(1000000) +
            sum(expr("u2 % 1000000"))).cast(DecimalType(30, 4)) / lit(10000))
            .cast(DoubleType).as("s2"))
        .write.format("noop").mode("overwrite").save()
    }
    time("split-long 2 sums")(splitQ1())
    // equality check: split-long vs decimal sum, exact doubles
    val dec = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_extendedprice").cast(DecimalType(30, 4))).cast(DoubleType).as("s"))
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.getDouble(2))
    val li2 = li.withColumn("u", u)
    val spl = li2.groupBy("l_returnflag", "l_linestatus")
      .agg(((sum(expr("u div 1000000")).cast(DecimalType(30, 0)) * lit(1000000) +
        sum(expr("u % 1000000"))).cast(DecimalType(30, 4)) / lit(10000))
        .cast(DoubleType).as("s"))
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.getDouble(2))
    println("bit-equal: " + dec.zip(spl).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) } +
      "  " + dec.take(2).mkString(",") + " vs " + spl.take(2).mkString(","))
    spark.stop()
  }
}
