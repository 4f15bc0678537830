package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MERGE (upsert) semantics over plain parquet (SURVEY §7 step 3) — the
  * catalog's "re-publish replaces the document" behavior generalized to
  * any keyed table.
  *
  * Plain parquet has no transaction log, so atomicity comes from a tiny
  * version pointer: each merge writes a complete new snapshot under
  * `v=<n>/` and then atomically swaps the `_CURRENT` pointer file
  * (write-temp + atomic rename). Readers resolve the pointer first, so
  * they always see a complete snapshot — never a half-written directory.
  * On a production deployment a transactional table format supplies the
  * same contract; the MERGE semantics here are format-independent.
  *
  * Scale shape: a merge is one left-anti join of the current snapshot
  * against the update keys (shuffle on the key columns) plus a union —
  * no driver-side row handling. THIS object rewrites the full snapshot
  * per merge, which is only appropriate for small tables (config,
  * registries); large keyed tables use [[BucketedMerge]], which rewrites
  * ONLY the key-buckets an update batch touches.
  */
object Merge {

  /** Resolve duplicate-keyed update rows to ONE deterministic winner per
    * key: the greatest non-key tuple (descending over all non-key columns),
    * which is partitioning- and rerun-stable — unlike a bare
    * `dropDuplicates`, whose survivor depends on physical row order. With
    * no non-key columns the rows are identical and any survivor is the
    * same row.
    */
  def dedupeUpdates(updates: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, row_number}
    val nonKeys = updates.columns.filterNot(keys.contains)
    if (nonKeys.isEmpty) updates.dropDuplicates(keys)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(nonKeys.map(c => col(c).desc_nulls_last): _*)
      updates.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Pure MERGE combinator: rows of `updates` win on key match; unmatched
    * `target` rows survive; unmatched `updates` insert. Both inputs must
    * share the schema. Duplicate-keyed updates resolve via
    * [[dedupeUpdates]] — both the first-create path and the merge path
    * enforce the same one-row-per-key contract.
    */
  def mergeFrames(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    mergeDeduped(target, dedupeUpdates(updates, keys), keys)

  /** [[mergeFrames]] for callers that already hold a DEDUPED (and possibly
    * persisted) update set — skips the second dedupe window the combined
    * path used to pay per merge. */
  def mergeDeduped(target: DataFrame, up: DataFrame, keys: Seq[String]): DataFrame =
    up.unionByName(
      target.join(up.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti"))

  /** Current version number, if the table exists. Resolved through the
    * table path's own filesystem ([[SnapshotIo]]) — a local-File probe
    * read every hdfs://s3a:// table as "never written". A MISSING pointer
    * beside committed snapshot data recovers via [[recoverVersion]]
    * instead of reporting "never written": on a filesystem without
    * atomic rename-over-existing the pointer swap has an unavoidable
    * delete→rename window, and defaulting to -1 there would restart
    * history at v=0 beside live data.
    */
  def currentVersion(dir: String): Option[Long] = {
    // A reader can race the pointer swap on filesystems whose
    // rename-over-existing is not one step FOR READERS: LocalFileSystem
    // renames the data file and its .crc sidecar separately, so a read
    // between the two throws ChecksumException (found by Sweep9Spec's
    // racing reader — the writer is atomic, the read is not). Transient
    // by construction: bounded retry, then fall through to
    // committed-evidence recovery, which is monotonic (manifests and
    // _SUCCESS markers only ever accumulate). An unparseable pointer
    // (torn content on a no-atomic-rename store) recovers the same way
    // instead of crashing every reader of the table.
    def readPtr(attempt: Int): Option[Long] =
      try SnapshotIo.readSmall(s"$dir/_CURRENT").flatMap(_.trim.toLongOption)
      catch {
        case _: java.io.IOException if attempt < 4 =>
          Thread.sleep(1L << attempt)
          readPtr(attempt + 1)
        case _: java.io.IOException => None
      }
    readPtr(0).orElse(recoverVersion(dir))
  }

  /** Pointer-loss recovery: the greatest COMMITTED version on disk.
    * Commit evidence, in precedence order: a `manifest-<n>.txt`
    * ([[BucketedMerge]] writes the manifest BEFORE the pointer, so a
    * manifest implies complete data — whereas its `v=<n>/_SUCCESS` can
    * exist for a merge whose manifest write crashed and must NOT be
    * resurrected); else `v=<n>/_SUCCESS` (plain [[Merge]] snapshots —
    * Spark's committer writes the marker only after the whole snapshot
    * commits, so a crash mid-`writeSnapshot` is never picked up).
    * Read-only: the pointer itself is rewritten by the next merge, not
    * by recovery — a read path must not race concurrent writers.
    */
  private def recoverVersion(dir: String): Option[Long] = {
    val entries = SnapshotIo.list(dir)
    val manifests = entries.flatMap { n =>
      if (n.startsWith("manifest-") && n.endsWith(".txt"))
        n.stripPrefix("manifest-").stripSuffix(".txt").toLongOption
      else None
    }
    if (manifests.nonEmpty) Some(manifests.max)
    else entries.filter(_.startsWith("v="))
      .flatMap(_.drop(2).toLongOption)
      .filter(v => SnapshotIo.exists(s"$dir/v=$v/_SUCCESS"))
      .maxOption
  }

  /** Read the current snapshot (empty-schema error if never written). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir).getOrElse(
      throw new IllegalStateException(s"no _CURRENT pointer in $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Write `df` as the next full snapshot and swap the pointer. */
  def writeSnapshot(df: DataFrame, dir: String): Long = {
    val next = currentVersion(dir).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$next")
    SnapshotIo.writeAtomic(s"$dir/_CURRENT", next.toString)
    next
  }

  /** MERGE `updates` into the table at `dir` by `keys`; creates the table
    * on first call. Returns the new version.
    */
  def mergeInto(spark: SparkSession, dir: String, updates: DataFrame,
      keys: Seq[String]): Long = {
    val merged = currentVersion(dir) match {
      case Some(_) => mergeFrames(read(spark, dir), updates, keys)
      case None => dedupeUpdates(updates, keys)
    }
    writeSnapshot(merged, dir)
  }

  /** TIME TRAVEL: read a specific retained snapshot version. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    require(SnapshotIo.exists(s"$dir/v=$version"),
      s"version $version not present (vacuumed or never written) in $dir")
    spark.read.parquet(s"$dir/v=$version")
  }

  /** CHANGE-DATA-CAPTURE between two retained snapshots: one row per key
    * whose state changed, classified insert/update/delete — the diff feed
    * downstream consumers subscribe to instead of re-reading the table.
    * A full-outer join on the keys with a row-hash comparison over the
    * non-key columns; at scale both snapshots hash-shuffle once on the
    * key (co-partitioned), and the row hash keeps the change test
    * narrow — no column-by-column comparison crosses the exchange.
    * Returns (keys…, change ∈ {insert, update, delete}).
    */
  def changes(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val before = readVersion(spark, dir, fromVersion)
    val after = readVersion(spark, dir, toVersion)
    val nonKeys = before.columns.filterNot(keys.contains).toSeq
    // The hash input must DISTINGUISH nulls per column: Spark's hash
    // functions skip null arguments, so (a=null, b='x') and (a='x',
    // b=null) would otherwise collide and a value hopping between
    // columns with compensating nulls would read as "unchanged". Each
    // column therefore contributes an explicit never-null null-FLAG plus
    // its coalesced value — no string sentinel, so no real cell value can
    // fake a null.
    def hashed(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+
        xxhash64(nonKeys.flatMap(c => Seq(
          col(c).isNull.cast("string"),
          coalesce(col(c).cast("string"), lit("")))): _*)
          .as(s"__h_$tag"): _*)
    hashed(before, "a").join(hashed(after, "b"), keys, "full_outer")
      .withColumn("change",
        when(col("__h_a").isNull, lit("insert"))
          .when(col("__h_b").isNull, lit("delete"))
          .when(col("__h_a") =!= col("__h_b"), lit("update")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** Drop all but the most recent `keep` snapshot directories. Entries
    * that merely LOOK like versions (`v=` followed by anything
    * non-numeric, e.g. crash leftovers) are skipped, never deleted.
    */
  def vacuum(dir: String, keep: Int = 2): Unit = {
    val cur = currentVersion(dir).getOrElse(return)
    SnapshotIo.list(dir).foreach { n =>
      if (n.startsWith("v=")) n.drop(2).toLongOption.foreach { ver =>
        if (ver <= cur - keep) SnapshotIo.delete(s"$dir/$n")
      }
    }
  }
}
