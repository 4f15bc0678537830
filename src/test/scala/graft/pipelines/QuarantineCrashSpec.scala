package graft.pipelines

import graft.SparkSpec
import graft.testfs.CrashFileSystem
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-point fuzz of the quarantine WRITE path: the (path, error,
  * batch_id) record lands via dynamic batch_id partition overwrite, and
  * the stream's at-least-once replay re-runs the whole batch — so a crash
  * at ANY filesystem mutation of the quarantine write, followed by the
  * replay, must converge to exactly one record per poison file: no loss
  * (a missing record hides a skipped file) and no duplication (a stale
  * committer task dir resurrected by the replay's job commit — the same
  * failure family CrashFuzzSpec found on Catalog.publish).
  */
class QuarantineCrashSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def crashDir(prefix: String): String = {
    CrashFileSystem.register(spark)
    CrashFileSystem.Scheme + ":" +
      java.nio.file.Files.createTempDirectory(prefix)
  }

  private val Poison = "/land/poison.emd"

  private def files: DataFrame =
    Seq((Poison, 0L), ("/land/good.emd", 1L)).toDF("path", "payload")
      .repartition(1)

  private def parse: DataFrame => DataFrame = df => {
    val fn = udf((p: String, v: Long) => {
      require(p != "/land/poison.emd", s"poison file: $p")
      v * 2
    })
    df.select(col("path"), fn(col("path"), col("payload")).as("parsed"))
  }

  private def runBatch(qDir: String): Unit =
    Quarantine.run(spark, files, parse, qDir, batchId = 3L) { g =>
      parse(g).write.format("noop").mode("overwrite").save()
    }

  private def schedule(n: Long): Seq[Long] = {
    val stride = math.max(1L, n / 32)
    (0L until n).filter(k => k < 12 || k >= n - 12 || k % stride == 0)
  }

  test("crash at every quarantine-write mutation + replay = exactly one record per poison file") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      // probe: mutations of one clean quarantined batch (only the qDir
      // parquet write mutates a filesystem — probes use the noop sink)
      val probe = crashDir("graft-qcrash-probe")
      CrashFileSystem.arm(Long.MaxValue)
      runBatch(probe)
      val n = CrashFileSystem.disarm()
      assert(n > 0, "probe measured no mutations — injection not wired")

      def check(qDir: String, k: Long): Unit = {
        val rows = spark.read.parquet(qDir)
          .select("path", "batch_id").collect()
        assert(rows.length == 1, s"k=$k: ${rows.length} quarantine rows")
        assert(rows.head.getString(0) == Poison, s"k=$k")
        assert(rows.head.getAs[Number]("batch_id").longValue == 3L, s"k=$k")
      }
      check(probe, -1L)

      var tested = 0
      schedule(n).foreach { k =>
        val qDir = crashDir(s"graft-qcrash-k$k")
        CrashFileSystem.arm(k)
        val crashed = try { runBatch(qDir); false }
          catch { case _: Throwable => true }
        CrashFileSystem.disarm()
        assert(crashed, s"k=$k of $n: batch completed under the fuse")
        // the stream's at-least-once replay of the SAME batch
        runBatch(qDir)
        check(qDir, k)
        // duplicate delivery after success stays converged
        runBatch(qDir)
        check(qDir, k)
        tested += 1
      }
      info(s"quarantine write: $tested crash points over $n mutations held")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
