package graft.tools

import org.apache.spark.sql.functions._

/** A/B meter for the nested-column vectorized parquet reader stance
  * (`core/GraftSession.scala`: reader OFF by default pending the
  * WindowGroupLimit NPE, see MultiFileArrayScanSpec). Times the
  * array-heavy scan shape the toggle actually affects — full decode of
  * the embeddings table's `array<float>` column into a per-row
  * aggregate — so the "cost ~0" claim in the stance comment is a
  * measured number, not an assertion.
  *
  * Run twice, once per setting (the reader config is fixed at session
  * build, and getOrCreate would pin the first session's conf):
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/tmp/graft_sf1ish sbt -batch "runMain graft.tools.NestedVecAb"
  * SPARK_GRAFT_NESTED_VEC=true SPARK_GRAFT_SF_DIR=/tmp/graft_sf1ish \
  *   sbt -batch "runMain graft.tools.NestedVecAb"
  * }}}
  */
object NestedVecAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1ish")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val setting = sys.env.getOrElse("SPARK_GRAFT_NESTED_VEC", "false")
    val spark = graft.core.GraftSession.local(cpus, "graft-nested-vec-ab")
    def pass(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          aggregate(col("embedding"), lit(0.0d), (acc, v) => acc + v)
            .as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    pass() // warmup: JIT + codegen + page cache
    val times = (1 to 5).map(_ => pass()).sorted
    println(s"""{"nested_vec":$setting,"dir":"$dir","median_s":${
      "%.4f".format(times(times.size / 2))},"min_s":${
      "%.4f".format(times.head)},"max_s":${"%.4f".format(times.last)}}""")
    spark.stop()
  }
}
