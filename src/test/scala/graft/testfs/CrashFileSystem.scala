package graft.testfs

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Crash-injection Hadoop FileSystem under the scheme `graftcrash:` —
  * local disk semantics ([[RawLocalFileSystem]]) with a global fuse over
  * MUTATING operations (create / rename / delete / mkdirs): once armed,
  * the (k+1)-th mutation throws IOException, simulating a process crash
  * at that exact filesystem step. Reads never tick the fuse, so
  * post-crash invariant checks observe the on-disk state the "crash"
  * left behind.
  *
  * The fuse is process-global (local[*] puts driver and executors in one
  * JVM) and the scheme is cache-disabled like
  * [[MockClusterFileSystem]], so instances created through the session
  * conf are never served to later bare-Configuration lookups.
  */
class CrashFileSystem extends RawLocalFileSystem {
  override def getScheme: String = CrashFileSystem.Scheme
  override def getUri: URI = URI.create(CrashFileSystem.Scheme + ":///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    CrashFileSystem.tick(s"create $f")
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  // the permission-less overload is a SEPARATE virtual method in
  // RawLocalFileSystem (the permission variant does not funnel through
  // it) — FileSystem.create(path, overwrite) lands here, and without this
  // override those creates never ticked the fuse (found by
  // WriteBatchCrashSpec's phase-split probe: a 2-file artifact write
  // registered only its renames)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    CrashFileSystem.tick(s"create $f")
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    CrashFileSystem.tick(s"rename $src -> $dst")
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    CrashFileSystem.tick(s"delete $p")
    super.delete(p, recursive)
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    CrashFileSystem.tick(s"mkdirs $p")
    super.mkdirs(p, permission)
  }
}

object CrashFileSystem {
  val Scheme = "graftcrash"

  private val count = new AtomicLong(0)
  @volatile private var fuse: Long = Long.MaxValue

  /** Allow `afterOps` mutations, then throw on every further one (a crash
    * leaves the process dead — later steps of the same logical operation
    * must not proceed either).
    */
  def arm(afterOps: Long): Unit = { count.set(0); fuse = afterOps }

  /** Disable injection; returns the mutation count since the last arm. */
  def disarm(): Long = { fuse = Long.MaxValue; count.get }

  private def tick(what: String): Unit = {
    val n = count.incrementAndGet()
    if (n > fuse)
      throw new java.io.IOException(s"injected crash at mutation $n: $what")
  }

  /** Register the scheme on `spark`'s Hadoop conf (cache disabled — see
    * [[MockClusterFileSystem.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(s"fs.$Scheme.impl", classOf[CrashFileSystem].getName)
    hc.setBoolean(s"fs.$Scheme.impl.disable.cache", true)
  }
}
