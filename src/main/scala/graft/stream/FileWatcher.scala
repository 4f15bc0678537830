package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingest (SURVEY §2 A1-A3, §2 G, §7 step 5) — the Spark
  * re-expression of the reference's watchdog/checkpoint pipeline
  * (/root/reference/picoprobe/utils.py:80-131,
  * examples/hyperspectral_flow/main.py:95-111).
  *
  * The reference's three moving parts collapse into Structured Streaming
  * built-ins:
  *   - `Watcher` poll loop        → file source micro-batches,
  *   - suffix/event filter        → a pushed-down `filter`,
  *   - append-only seen-set file  → the engine checkpoint (file-source log)
  *                                  plus a `dropDuplicates` state store.
  * Exactly-once across restarts is the checkpoint's contract — the
  * property the reference implements by hand with `CheckPoint.seen`.
  *
  * Scale note: the file-source listing is driver-side; at 100 TB the watch
  * dir must be a partitioned landing zone (e.g. dt=.../hh=...) with
  * `maxFilesPerTrigger` bounding batch size; content bytes are only
  * materialized executor-side.
  */
object FileWatcher {

  /** Unbounded stream of matching file events: one row per newly-seen file
    * with `path`, `modificationTime`, `length`, `content` (binary) and the
    * derived `experiment_id` (file stem, the reference's run naming).
    */
  /** The binaryFile source's fixed schema (streaming sources require it
    * explicitly).
    */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  def fileEvents(spark: SparkSession, dir: String, suffix: String = ".emd",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", s"*$suffix")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(dir)
      .filter(col("path").endsWith(suffix))
      .dropDuplicates("path")
      .withColumn("experiment_id",
        regexp_replace(element_at(split(col("path"), "/"), -1),
          "\\.[^.]+$", ""))
  }

  /** Crash-scratch hygiene for a checkpoint about to be (re)opened: the
    * engine's metadata logs write `.<batch>.<uuid>.tmp` then rename, and a
    * crash between the two leaves the orphan behind FOREVER — Spark never
    * cleans it, and its batch-0 validation
    * (STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY) then refuses to start a
    * query whose very first offset write crashed: a permanently wedged
    * pipeline, found by FileWatcherCrashSpec's crash-point fuzz. A
    * checkpoint has ONE writer (Spark itself enforces one active query per
    * checkpoint), so dot-tmp files here can only be crash leftovers.
    */
  private def cleanCrashScratch(spark: SparkSession, checkpoint: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    def clean(dir: org.apache.hadoop.fs.Path): Unit =
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith(".") && n.endsWith(".tmp")) {
          fs.delete(st.getPath, false)
          ()
        }
      }
    clean(root)
    Seq("offsets", "commits").foreach(d =>
      clean(new org.apache.hadoop.fs.Path(root, d)))
    val sources = new org.apache.hadoop.fs.Path(root, "sources")
    if (fs.exists(sources)) fs.listStatus(sources).foreach { st =>
      if (st.isDirectory) clean(st.getPath)
    }
  }

  // Start serialization per checkpoint (same pattern as
  // Catalog.publishLocks): Spark's one-active-query-per-checkpoint
  // enforcement only fires INSIDE .start(), but cleanCrashScratch runs
  // BEFORE it — so without this, two near-simultaneous start() calls on
  // one checkpoint let the loser delete the winner's in-flight `.tmp`
  // metadata write before failing. Under the lock, a checkpoint whose
  // last start()ed query is still ACTIVE skips the hygiene entirely (its
  // dot-tmp files are live writes, not crash leftovers) and falls through
  // to .start(), where Spark raises its own concurrent-query error.
  // Cross-process starters remain a deployment contract, exactly like
  // Catalog.publish.
  private val startLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val activeByCheckpoint =
    new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()

  private def checkpointKey(spark: SparkSession, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toUri.toString
  }

  /** Run a per-batch action over the event stream with engine-managed
    * exactly-once (SURVEY §2 A2/A3). `drain = true` uses AvailableNow —
    * process everything then stop (the test/batch-replay mode); otherwise
    * a 10 s processing-time trigger, the reference simulator's cadence
    * (SURVEY §2 G). One ACTIVE query per checkpoint per process (see
    * [[startLocks]]); per cluster it is the usual deployment contract.
    */
  def start(events: DataFrame, checkpoint: String, drain: Boolean = false)(
      batchFn: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = events.sparkSession
    val key = checkpointKey(spark, checkpoint)
    startLocks.computeIfAbsent(key, _ => new Object).synchronized {
      val prior = activeByCheckpoint.get(key)
      if (prior == null || !prior.isActive)
        cleanCrashScratch(spark, checkpoint)
      val q = events.writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(if (drain) Trigger.AvailableNow() else Trigger.ProcessingTime("10 seconds"))
        .foreachBatch(batchFn)
        .start()
      activeByCheckpoint.put(key, q)
      q
    }
  }

  /** The production pipeline shape (SURVEY §3.1): watch → per-file metadata
    * → idempotent catalog publish. Replaces the reference's five network
    * hops (watch → Transfer → funcX tool → Publish → Search) with one
    * in-cluster stream.
    */
  def ingestToCatalog(spark: SparkSession, watchDir: String,
      catalogPath: String, checkpoint: String, suffix: String = ".emd",
      drain: Boolean = false): StreamingQuery = {
    val events = fileEvents(spark, watchDir, suffix)
      .select(col("path"), col("content"), lit("{}").as("metadata_json"))
    start(events, checkpoint, drain) { (batch, _) =>
      graft.catalog.Catalog.publish(spark,
        graft.catalog.Catalog.dataciteDoc(batch), catalogPath)
    }
  }
}
