package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, Options, Path}

/** Sidecar-file I/O for the versioned-snapshot formats ([[Merge]],
  * [[BucketedMerge]]): version pointers and manifests, resolved through the
  * table path's OWN filesystem.
  *
  * The previous `java.nio.file` implementation bound every pointer
  * operation to the driver's local disk. On a cluster filesystem
  * (`hdfs://`, `s3a://`) that meant `currentVersion` silently reported
  * "table never written" (a merge would then create v=0 beside live
  * history), vacuum silently no-opped, and pointer writes failed on paths
  * like `hdfs:/...` treated as relative local files. The parquet data
  * writes always went through Hadoop — only the sidecars were local-bound.
  *
  * The pointer swap stays ATOMIC where the filesystem provides it:
  * `FileContext.rename(OVERWRITE)` is atomic on HDFS and POSIX-local. An
  * object store without atomic rename falls back to delete+rename and
  * needs a transactional table format for concurrent readers — the same
  * caveat the [[Merge]] scaladoc already states.
  */
private[catalog] object SnapshotIo {

  // getActiveSession is THREAD-LOCAL: a vacuum/cleanup thread spawned
  // outside Spark's own pools has none, and a bare Configuration() there
  // would drop every spark.hadoop.* setting (object-store credentials,
  // custom fs impls) — resolving the same table path through a DIFFERENT
  // filesystem than the data writes. Fall through the process-wide
  // default session before giving up.
  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).exists(p)
  }

  /** Full UTF-8 content of a small sidecar file, or None when absent. */
  def readSmall(path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toString("UTF-8"))
      } finally in.close()
    }
  }

  /** Write `content` to `path` via a temp file + rename swap. The rename
    * overwrites an existing file; readers see either the old or the new
    * content, never a partial write.
    */
  def writeAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val bytes = content.getBytes("UTF-8")
    try {
      val fc =
        if (p.toUri.getScheme == null) FileContext.getFileContext(conf)
        else FileContext.getFileContext(p.toUri, conf)
      val out = fc.create(tmp,
        java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try out.write(bytes) finally out.close()
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding (some object stores): plain
        // FileSystem path. Try rename-over-existing FIRST — most
        // FileSystem impls (posix local, object-store clients) replace
        // atomically — and only when the filesystem REFUSES (HDFS-style
        // no-overwrite rename returns false) delete and retry. The old
        // delete-before-rename left a window with NO pointer at all: a
        // crash between the two read as "table never written" and the
        // next merge restarted history at v=0 beside live data — the
        // exact corruption class this object exists to prevent.
        // ([[Merge.currentVersion]] additionally recovers a lost pointer
        // from the committed v= directories, closing the residual
        // delete→crash window this path cannot eliminate.)
        val fs = fsOf(p)
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        if (!fs.rename(tmp, p)) {
          fs.delete(p, false)
          if (!fs.rename(tmp, p))
            throw new java.io.IOException(s"rename $tmp -> $p failed")
        }
    }
  }

  def mkdirs(dir: String): Unit = {
    val p = new Path(dir)
    fsOf(p).mkdirs(p)
    ()
  }

  /** Child entry names of `dir` (empty when the directory is absent). */
  def list(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  /** Recursive delete; no-op when absent. */
  def delete(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, true)
    ()
  }
}
