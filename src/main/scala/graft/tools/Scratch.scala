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

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-44s min=${ts.min}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    // st1 body with conf variations, to attribute the per-trigger floor
    val batch = Tables.load(spark, dir, "events")
    val replay = {
      val tmp = java.nio.file.Files.createTempDirectory("scratch-replay").toString
      batch.repartition(4, col("event_id"))
        .write.mode("overwrite").parquet(s"$tmp/events")
      s"$tmp/events"
    }
    def st1(parts: Int, extra: Map[String, String], ckptShm: Boolean): Unit = {
      val olds = (extra.keys ++ Seq("spark.sql.shuffle.partitions")).map { k =>
        k -> spark.conf.getOption(k)
      }.toMap
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      extra.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val src = spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", "2").parquet(replay)
        val agg = src
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withWatermark("event_time", "30 days")
          .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val sink = "scr_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val w = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
        val w2 = if (ckptShm) w.option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "scr-ckpt").toString)
        else w
        val q = w2.start()
        try q.processAllAvailable() finally q.stop()
        spark.sql(s"DROP TABLE IF EXISTS $sink")
        ()
      } finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val combo = Map(
      "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s",
      "spark.sql.streaming.stateStore.unloadOnCommit" -> "true")
    time("st1 parts=8 (current)") { st1(8, Map.empty, ckptShm = false) }
    time("st1 parts=8 combo") { st1(8, combo, ckptShm = false) }
    time("st1 parts=4 combo") { st1(4, combo, ckptShm = false) }
    time("st1 parts=2 combo") { st1(2, combo, ckptShm = false) }
    time("st1 parts=4 combo+shm") { st1(4, combo, ckptShm = true) }
    spark.stop()
  }
}
