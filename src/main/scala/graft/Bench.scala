package graft
import org.apache.spark.sql.SparkSession

object Bench {

  private val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.local(cpus.toInt, "graft-bench")

    // Stable order: Map iteration is hash-ordered, which would hand the
    // JVM/codegen warmup cost to a random query each run.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Boolean =
      // noop sink: forces FULL evaluation of every output column (a bare
      // count() would let Catalyst prune the projections being measured).
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed on $dir: ${e.getMessage}")
        false
      }

    // Untimed warmup at the smallest sf: JIT + codegen + classloading are
    // one-time JVM costs, not per-query work; data stays cold for sfDir.
    ordered.foreach { case (_, fn) => runOne(fn, "/root/testdata/sf0.001") }
    // drop working sets persisted by multi-pass queries (LSH dedup) during
    // warmup — the timed pass should start from a clean storage pool
    spark.sharedState.cacheManager.clearCache()

    // Median of several timed passes per query: a single contended pass on
    // a noisy host can misstate an individual query by 3-10×; the median is
    // robust to one bad sample and min/max records the observed spread.
    val results = ordered.map { case (name, fn) =>
      val samples = (1 to Passes).map { _ =>
        val t0 = System.nanoTime()
        val ok = runOne(fn, sfDir)
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val ok = samples.forall(_._2)
      val times = samples.map(_._1).sorted
      (name, times(times.size / 2), times.head, times.last, ok)
    }
    def f(v: Double): String = "%.4f".format(v)
    // failed queries report null (not a near-zero time that would read as
    // a fast success) and are named in "failed"
    val qs = results.map { case (k, med, _, _, ok) =>
      "\"" + k + "\":" + (if (ok) f(med) else "null")
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, _, min, max, true) =>
      "\"" + k + "\":{\"min\":" + f(min) + ",\"max\":" + f(max) + "}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, med, _, _, true) => med }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"spread":$spread,"passes":$Passes,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
