package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped MERGE over versioned parquet: the snapshot is laid out
  * in `nBuckets` hash-buckets of the merge key, and a merge REWRITES ONLY
  * THE BUCKETS CONTAINING UPDATE KEYS — write amplification is
  * O(touched buckets), not O(table). A 100 TB catalog takes point-update
  * batches without re-materializing itself (the flaw [[Merge]] documents).
  *
  * Atomicity comes from a per-version MANIFEST that maps every bucket to
  * the version whose directory holds its current data:
  *
  * {{{
  * dir/
  *   _CURRENT            # version pointer (atomic rename swap)
  *   manifest-<n>.txt    # nBuckets + bucket -> data-version map
  *   v=<n>/bucket=<b>/   # parquet, written once, never mutated
  * }}}
  *
  * A merge writes the merged touched buckets under `v=<next>/`, writes
  * `manifest-<next>` pointing touched buckets at `<next>` and untouched
  * buckets at their PREVIOUS locations (their files are never rewritten —
  * pointer-swapped forward), then atomically swaps `_CURRENT`. Readers
  * resolve pointer → manifest → bucket paths, so they always see one
  * complete, consistent snapshot.
  *
  * Scale shape: the touched-bucket set is found with one distinct over the
  * update keys' bucket ids (≤ nBuckets values — driver-tiny); the merge
  * itself is [[Merge.mergeFrames]] restricted to the touched buckets' data
  * (anti-join shuffles only those buckets, not the table). At 100 TB pick
  * nBuckets so one bucket ≈ a few GB; merge cost is then proportional to
  * the update batch's key spread, independent of table size.
  */
object BucketedMerge {

  private val BucketCol = "bucket"

  final case class Manifest(nBuckets: Int, buckets: Map[Int, Long])

  /** Hash-bucket id of the key columns — Spark's Murmur3, stable across
    * runs and partitionings.
    */
  def bucketExpr(keys: Seq[String], nBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  def currentVersion(dir: String): Option[Long] = Merge.currentVersion(dir)

  // sidecar I/O resolves through the table path's own filesystem
  // ([[SnapshotIo]]) — local java.nio probes read every cluster-FS table
  // as "never written" and vacuum silently no-opped on them
  private def manifestPath(dir: String, v: Long) = s"$dir/manifest-$v.txt"

  def readManifest(dir: String, v: Long): Manifest = {
    val text = SnapshotIo.readSmall(manifestPath(dir, v)).getOrElse(
      throw new IllegalStateException(s"manifest for version $v missing in $dir"))
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val n = lines.head.stripPrefix("nBuckets=").toInt
    val m = lines.tail.map { l =>
      val Array(b, ver) = l.split("=", 2); b.toInt -> ver.toLong
    }.toMap
    Manifest(n, m)
  }

  private def writeVersion(dir: String, v: Long, m: Manifest): Unit = {
    val body = (s"nBuckets=${m.nBuckets}" +:
      m.buckets.toSeq.sortBy(_._1).map { case (b, ver) => s"$b=$ver" })
      .mkString("\n")
    SnapshotIo.writeAtomic(manifestPath(dir, v), body)
    // manifest is complete on disk before the pointer moves
    SnapshotIo.writeAtomic(s"$dir/_CURRENT", v.toString)
  }

  private def bucketDir(dir: String, ver: Long, b: Int): String =
    s"$dir/v=$ver/$BucketCol=$b"

  /** Paths holding the named buckets' current data (absent buckets — never
    * yet written — contribute no path).
    */
  private def bucketPaths(dir: String, m: Manifest, buckets: Iterable[Int]): Seq[String] =
    buckets.toSeq.sorted.flatMap(b => m.buckets.get(b).map(bucketDir(dir, _, b)))

  /** Read the current snapshot (bucket column not included — it is layout,
    * not data).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir).getOrElse(
      throw new IllegalStateException(s"no _CURRENT pointer in $dir"))
    val m = readManifest(dir, v)
    val paths = bucketPaths(dir, m, m.buckets.keys)
    // a zero-path spark.read.parquet() dies with an opaque schema-inference
    // error; say what actually happened (created from an empty batch)
    if (paths.isEmpty) throw new IllegalStateException(
      s"bucketed table at $dir (version $v) maps no buckets — it holds no data")
    spark.read.parquet(paths: _*)
  }

  /** Read only the named buckets of the current snapshot. */
  private def readBuckets(spark: SparkSession, dir: String, m: Manifest,
      buckets: Set[Int]): Option[DataFrame] = {
    val paths = bucketPaths(dir, m, buckets)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** INCREMENTAL SCAN (CDC consumption): the current rows of only the
    * buckets whose manifest pointer moved in (vFrom, vTo] — the catch-up
    * primitive for a consumer that already processed snapshot `vFrom`.
    * Planning is pure manifest metadata (two tiny pointer maps diffed
    * driver-side, like any table-format client); untouched buckets are
    * never listed, opened, or scanned — at 100 TB a point-update history
    * makes catch-up cost proportional to CHANGE, not table size. Returns
    * the changed bucket ids plus their rows at `vTo` (None when nothing
    * changed). Contrast c3's full-snapshot CDC diff, which compares row
    * hashes when no manifest history exists.
    */
  def readChanged(spark: SparkSession, dir: String, vFrom: Long,
      vTo: Long): (Seq[Int], Option[DataFrame]) = {
    val from = readManifest(dir, vFrom)
    val to = readManifest(dir, vTo)
    val changed = to.buckets.collect {
      case (b, dv) if !from.buckets.get(b).contains(dv) => b
    }.toSeq.sorted
    (changed, readBuckets(spark, dir, to, changed.toSet))
  }

  private def writeBuckets(df: DataFrame, keys: Seq[String], nBuckets: Int,
      dir: String, v: Long): Unit = {
    require(!df.columns.contains(BucketCol),
      s"input schema may not contain the reserved column '$BucketCol'")
    df.withColumn(BucketCol, bucketExpr(keys, nBuckets))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(s"$dir/v=$v")
  }

  /** MERGE `updates` into the bucketed table at `dir` by `keys`; creates
    * the table with `nBuckets` buckets on first call (nBuckets is fixed at
    * create time and read from the manifest thereafter). Duplicate-keyed
    * updates resolve via [[Merge.dedupeUpdates]]. Returns the new version.
    */
  def mergeInto(spark: SparkSession, dir: String, updates: DataFrame,
      keys: Seq[String], nBuckets: Int = 64): Long = {
    currentVersion(dir) match {
      case None =>
        SnapshotIo.mkdirs(dir)
        val up = Merge.dedupeUpdates(updates, keys)
        writeBuckets(up, keys, nBuckets, dir, 0L)
        val written = listWrittenBuckets(dir, 0L)
        writeVersion(dir, 0L, Manifest(nBuckets, written.map(_ -> 0L).toMap))
        0L
      case Some(v) =>
        val m = readManifest(dir, v)
        val next = v + 1
        // key TYPES must match the stored table's: Murmur3 is
        // type-dependent (hash(1: int) != hash(1L)), so a widened or
        // narrowed key batch would compute a touched-bucket set
        // inconsistent with where unionByName's coercion actually lands
        // the rows — manifest pointers at nonexistent dirs, duplicate
        // keys in never-read buckets
        readBuckets(spark, dir, m, m.buckets.keySet).foreach { table =>
          keys.foreach { k =>
            val tt = table.schema(k).dataType
            val ut = updates.schema(k).dataType
            require(tt == ut,
              s"merge key $k: updates type $ut != stored table type $tt " +
                "(hash-bucketing is type-dependent; cast the batch first)")
          }
        }
        // persisted: the deduped set is evaluated by the touched collect,
        // the anti-join and the bucket write — re-running a
        // nondeterministic updates source between those actions would make
        // the manifest's touched set disagree with the buckets actually
        // written (pointers at missing dirs, rows behind stale pointers)
        val up = Merge.dedupeUpdates(updates, keys)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // touched-bucket set: ≤ nBuckets distinct values — driver-tiny
          // (this collect also materializes the persist)
          val touched = up.select(bucketExpr(keys, m.nBuckets).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet
          val merged = readBuckets(spark, dir, m, touched) match {
            case Some(existing) => Merge.mergeDeduped(existing, up, keys)
            case None => up
          }
          writeBuckets(merged, keys, m.nBuckets, dir, next)
          // untouched buckets pointer-swap forward; their files never move
          writeVersion(dir, next,
            Manifest(m.nBuckets, m.buckets ++ touched.map(_ -> next)))
          next
        } finally {
          up.unpersist(blocking = false)
          ()
        }
    }
  }

  private def listWrittenBuckets(dir: String, v: Long): Seq[Int] =
    SnapshotIo.list(s"$dir/v=$v")
      .filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toInt)

  private val ManifestName = """manifest-(\d+)\.txt""".r

  /** Drop version directories and manifests no kept manifest references.
    * Unlike [[Merge.vacuum]], a version directory may hold CURRENT data
    * for buckets untouched since — only unreferenced ones delete. Entries
    * that merely LOOK versioned (crash leftovers like `manifest-3.txt.tmp`)
    * are skipped, never deleted and never a parse crash.
    */
  def vacuum(dir: String, keep: Int = 2): Unit = {
    val cur = currentVersion(dir).getOrElse(return)
    val keptVersions = ((cur - keep + 1) max 0L) to cur
    val referenced = keptVersions
      .filter(v => SnapshotIo.exists(manifestPath(dir, v)))
      .flatMap(v => readManifest(dir, v).buckets.values).toSet
    SnapshotIo.list(dir).foreach { n =>
      // versions ABOVE cur are an in-flight merge's (data + manifest land
      // BEFORE the _CURRENT swap) — deleting them here would corrupt the
      // table the instant that merge swaps the pointer. Only versions
      // <= cur are this tool's to reclaim.
      n match {
        case _ if n.startsWith("v=") =>
          n.drop(2).toLongOption.foreach { ver =>
            if (ver <= cur && !referenced.contains(ver))
              SnapshotIo.delete(s"$dir/$n")
          }
        case ManifestName(verStr) =>
          val ver = verStr.toLong
          if (ver <= cur && !keptVersions.contains(ver))
            SnapshotIo.delete(s"$dir/$n")
        case _ => ()
      }
    }
  }
}
