package graft.tools

import graft.core.{GraftSession, Tables}

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "scratch")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    println("SCRATCH schema: " + ev.schema.simpleString)
    ev.limit(3).collect().foreach(r => println("SCRATCH row: " + r))
    spark.stop()
  }
}
