package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Poison-pill quarantine for file-batch pipelines (shared by
  * [[HyperspectralPipeline]] and [[SpatiotemporalPipeline]]).
  *
  * Without it, a file whose parse fails kills the micro-batch, the batch
  * never commits, and a restart re-reads the SAME file — an infinite
  * crash loop (the exactly-once gate only advances past a file when its
  * batch succeeds). The reference's per-file task model degrades
  * differently: one funcX task dies, the service survives
  * (/root/reference/examples/hyperspectral_flow/main.py's per-file tool
  * dispatch). This helper re-expresses that for the batched stream.
  *
  * Cost model: ZERO on the happy path — the probe only runs after a
  * batch has already failed, and the bisect is logarithmic: failing
  * GROUPS split in half and only failing halves recurse, so attribution
  * costs O(bad · log N) probe jobs, not O(N). The case that makes this
  * matter is exactly the restart story: a pipeline restarted after
  * downtime sweeps the whole backlog into ONE batch, and a 5,000-file
  * backlog with one poison file must not pay 5,000 sequential driver
  * jobs before committing.
  */
object Quarantine {

  /** Root-cause message of a (possibly wrapped) failure: task failures
    * arrive as SparkException → cause chains, and the quarantine record
    * must carry the decoder's refuse-by-name text, not the scheduler's
    * wrapper. A null-message root reports its class name; a chain cut by
    * serialization (the executor-side cause dropped, leaving only the
    * wrapper) degrades to the wrapper's own message — never null, never
    * a throw. Self-referential causes terminate.
    */
  private[pipelines] def rootMsg(e: Throwable): String = {
    var c: Throwable = e
    while (c.getCause != null && (c.getCause ne c)) c = c.getCause
    Option(c.getMessage).getOrElse(c.getClass.getName)
  }

  /** Group-bisect attribution: probe `group` as one job; a healthy group
    * is cleared wholesale, a failing group splits in half and recurses.
    * At a failing LEAF the probe re-runs once — a data-borne failure is
    * deterministic and fails again (quarantine, with the retry's root
    * message as the record), while a transient infrastructure failure
    * (executor loss, disk hiccup) passes on retry and the file survives
    * un-quarantined instead of being permanently skipped past by the
    * exactly-once gate.
    */
  private def bisect(group: Vector[String],
      probe: Vector[String] => Option[String]): Vector[(String, String)] =
    probe(group) match {
      case None => Vector.empty
      case Some(_) if group.size == 1 =>
        probe(group) match {
          case Some(err) => Vector((group.head, err))
          case None => Vector.empty // transient: passed on retry
        }
      case Some(_) =>
        val (l, r) = group.splitAt(group.size / 2)
        bisect(l, probe) ++ bisect(r, probe)
    }

  /** Run `analyze(files)`; on failure bisect with `parse` as the probe,
    * write data-borne failures to `qDir` as (path, error, batch_id) rows
    * (idempotent batch_id partition overwrite — the same at-least-once
    * replay shape as the analysis sinks), and re-run `analyze` on the
    * survivors. A failure NO probe explains is an infrastructure error:
    * rethrown, keeping fail-fast where retrying is the correct response.
    */
  def run(spark: SparkSession, files: DataFrame,
      parse: DataFrame => DataFrame, qDir: String, batchId: Long)(
      analyze: DataFrame => Unit): Unit =
    try analyze(files)
    catch { case first: Exception =>
      // the probe forces FULL evaluation of the parsed frame (noop sink —
      // a count() would let column pruning skip the failing expression)
      def probe(group: Vector[String]): Option[String] = {
        val subset = files.filter(col("path").isin(group: _*))
        try { parse(subset).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Exception => Some(rootMsg(e)) }
      }
      val paths = files.select("path").collect().map(_.getString(0)).toVector
      val bad = bisect(paths, probe)
      if (bad.isEmpty) throw first
      import spark.implicits._
      bad.toDF("path", "error")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(qDir)
      val badSet = bad.map(_._1).toSet
      val good = files.filter(!col("path").isin(badSet.toSeq: _*))
      if (!good.isEmpty) analyze(good)
    }
}
