package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog/publish engine (SURVEY §2 A10/D5, §7 step 3) — the Spark
  * re-expression of the reference's Publishv2 gather-metadata + search-ingest
  * stage (/root/reference/examples/hyperspectral_flow/main.py:30-33,78-88;
  * document shape observed in examples/xloop2023/data/performance_*.pkl).
  *
  * The catalog is a parquet table keyed by `subject`; "search" is ordinary
  * filters over nested columns. All checksums run distributed via codegen'd
  * `sha2`/`md5` — no driver-side hashing, so cataloging scales with the
  * cluster, unlike the reference's one-funcX-call-per-file path.
  */
object Catalog {

  /** Extension → MIME lookup (the reference relies on Publishv2's mime
    * inference; we make the table explicit). Unknowns fall back to
    * application/octet-stream.
    */
  val MimeByExtension: Map[String, String] = Map(
    "txt" -> "text/plain", "json" -> "application/json",
    "csv" -> "text/csv", "png" -> "image/png", "jpg" -> "image/jpeg",
    "mp4" -> "video/mp4", "emd" -> "application/x-hdf5",
    "h5" -> "application/x-hdf5", "parquet" -> "application/vnd.apache.parquet")

  /** MIME type of a filename column, via its lowercase extension. A literal
    * map + element_at stays inside whole-stage codegen (no UDF).
    */
  def mimeOf(filename: Column): Column = {
    val m = map(MimeByExtension.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(
      element_at(m, lower(regexp_extract(filename, "\\.([^./]+)$", 1))),
      lit("application/octet-stream"))
  }

  /** Per-file metadata block (SURVEY §2 A10): url, byte length, sha256,
    * sha512, basename, mime — the `files[]` entry shape of the observed
    * catalog documents (FIXTURES F5).
    */
  def fileMetadata(path: Column, content: Column): Column =
    struct(
      concat(lit("globus://"), path).as("url"),
      length(content).cast("long").as("length"),
      sha2(content, 256).as("sha256"),
      sha2(content, 512).as("sha512"),
      element_at(split(path, "/"), -1).as("filename"),
      mimeOf(path).as("mime_type"))

  /** Assemble a DataCite-style catalog document per row (SURVEY §2 D5 —
    * struct composition replaces the reference's dict merges). Input needs
    * `path` (string), `content` (binary or string) and `metadata_json`
    * (string) columns; everything else is derived.
    */
  def dataciteDoc(df: DataFrame, publisher: String = "graft",
      publicationYear: Int = 2026): DataFrame =
    df.select(
      concat(lit("globus://"), col("path")).as("subject"),
      struct(
        array(struct(element_at(split(col("path"), "/"), -1).as("title"))).as("titles"),
        lit(publisher).as("publisher"),
        lit(publicationYear.toString).as("publicationYear"),
        array(mimeOf(col("path"))).as("formats"),
        lit("http://datacite.org/schema/kernel-4").as("schemaVersion")).as("dc"),
      array(fileMetadata(col("path"), col("content"))).as("files"),
      col("metadata_json").as("experiment_metadata"),
      lit("picoprobe").as("exp_type"),
      array(lit("public")).as("visible_to"))

  // One lock object per catalog PATH (normalized — '/cat' vs '/cat/' vs a
  // scheme-qualified spelling of the same directory must map to ONE lock,
  // or the serialization silently splits): the scratch hygiene below
  // deletes `_temporary` under the destination, which is only safe when no
  // OTHER publish to the same path is mid-write (its committer scratch
  // would be silently dropped). Several entry points accept a catalogPath
  // (ingestToCatalog, both pipelines), so two streams in one application
  // CAN point at one shared catalog — serialize them here. Cross-process
  // publishers remain a deployment contract (one writer per catalog, the
  // same contract every non-transactional table format states). The map
  // grows one entry per distinct catalog touched by this JVM and is never
  // evicted — bounded by the handful of catalogs a real deployment has,
  // not by publish volume.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Normalized lock key: Hadoop Path construction strips trailing
    * slashes and dot segments, and qualifying against the path's own
    * filesystem converges unqualified and scheme-qualified spellings of
    * the same directory (`/cat` vs `file:/cat`, or vs `hdfs://nn/cat`
    * under a cluster defaultFS). */
  private def lockKey(spark: SparkSession, catalogPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(catalogPath)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toUri.toString
  }

  /** Idempotent publish: append only documents whose `subject` is not yet
    * in the catalog (the reference's re-ingest of an existing subject
    * overwrites in Globus Search; an anti-join append gives the same
    * observable catalog). On a real deployment this is a Delta `MERGE`;
    * parquet + broadcast anti-join keeps the same semantics here, with the
    * existing-subjects side pruned to one column at the scan.
    *
    * Publishes to the same `catalogPath` serialize within the JVM (see
    * [[publishLocks]]): concurrent streams sharing a catalog neither race
    * the anti-join's read-then-append (lost rows) nor each other's
    * committer scratch (the `_temporary` hygiene delete).
    */
  def publish(spark: SparkSession, docs: DataFrame, catalogPath: String): Unit =
    publishLocks.computeIfAbsent(lockKey(spark, catalogPath), _ => new Object)
      .synchronized {
        publishLocked(spark, docs, catalogPath)
      }

  private def publishLocked(spark: SparkSession, docs: DataFrame,
      catalogPath: String): Unit = {
    val fresh = docs.dropDuplicates("subject")
    // committed-data probe, not bare existence: a catalog dir holding only
    // a crashed first publish's _temporary leftovers (or pre-created
    // empty) would otherwise fail schema inference on every retry —
    // wedging publish permanently (graft.core.DataDir scaladoc)
    val toWrite =
      if (graft.core.DataDir.nonEmpty(spark, catalogPath)) {
        val existing = spark.read.parquet(catalogPath).select("subject")
        fresh.join(broadcast(existing), Seq("subject"), "left_anti")
      } else fresh
    // crash-leftover hygiene: append jobs SHARE `_temporary` under the
    // destination. A publish whose job commit crashed mid-merge leaves
    // COMMITTED task dirs there; the next publish would re-append the
    // missing subjects itself AND its own job commit would resurrect the
    // stale task dirs — duplicate subjects (found by CrashFuzzSpec).
    // Publish is single-writer per catalogPath (enforced in-JVM by
    // [[publishLocks]]; cross-process by deployment contract), so scratch
    // here can only be crash leftovers: remove it before writing.
    val scratch = new org.apache.hadoop.fs.Path(catalogPath, "_temporary")
    val fs = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(scratch)) fs.delete(scratch, true)
    toWrite.write.mode("append").parquet(catalogPath)
  }
}
