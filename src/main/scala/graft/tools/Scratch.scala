package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val li = Tables.load(spark, dir, "lineitem")
    // warm JIT + file cache
    time("warmup scan")(li.write.format("noop").mode("overwrite").save())

    time("scan noop")(li.write.format("noop").mode("overwrite").save())
    time("scan 2cols")(li.select("l_returnflag", "l_quantity")
      .write.format("noop").mode("overwrite").save())
    time("plain double aggs")(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    time("q1 full")(graft.queries.RelationalQueries.q1Agg.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("q1 full again")(graft.queries.RelationalQueries.q1Agg.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
