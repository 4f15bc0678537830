package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev A/B: suite-subset wall time with AQE on (the shipped default) vs
  * off — sizes how much of the local bench floor is AQE's per-stage
  * driver orchestration (stats collection + re-optimization + stage-by-
  * stage job submission) vs genuine cluster work. Informational only:
  * the shipped session keeps AQE on (skew-join + partition coalescing
  * are the 100 TB levers); this meter prices what that costs at
  * harness scale. Usage: `sbt "runMain graft.tools.AqeAb [names…]"`.
  */
object AqeAb {

  private def session(aqe: Boolean, cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-aqe-$aqe")
      .withExtensions(new graft.expressions.GraftSqlExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // default subset: a floor-band slice + the heavy non-streaming tail
    val extra = args.drop(1)
    val names: Seq[String] =
      if (extra.nonEmpty) extra.toSeq
      else Seq("q1_agg", "q6_region_join", "q18_rollup", "q42_quality_checks",
        "q44_variant", "q48_grouping_sets", "q54_value_concentration",
        "q57_mad_anomaly", "q58_equal_freq_bins", "q59_gap_fill",
        "c4_forget", "c5_fk_audit", "d4_ngram_jaccard", "d9_incremental_dedup",
        "d11_canonical_select", "s9_kmeans", "s10_pq_adc", "t13_lm_familiarity",
        "g6_background", "q27_range_join")
    val qs = graft.SparkEntry.queries
    // one leg per JVM (first arg "true"/"false") — JVM-memoized per-dir
    // caches (trained models, media stores) bind to the first session,
    // so a second session in the same process would serve stale handles
    val legs = args.headOption match {
      case Some("true")  => Seq(true)
      case Some("false") => Seq(false)
      case _             => Seq(true, false)
    }
    legs.foreach { aqe =>
      val spark = session(aqe, cpus)
      val per = names.map { n =>
        val fn = qs.getOrElse(n, sys.error(s"unknown query $n"))
        fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        n -> walls.min
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      println(f"AQE=$aqe%-5s total_min=${per.map(_._2).sum}%7.3f  " +
        per.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
  }
}
