package graft.tools

import graft.core.GraftSession
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

    // mirror the bench exactly: warmup at sf0.001, then timed at sf0.1
    time("warmup d5 sf0.001")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save())
    time("timed d5 sf0.1")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("timed d5 sf0.1 again")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("timed d5 sf0.1 3rd")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
