package graft.testfs

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Read-failure injection under the scheme `graftreadpoison:` — local disk
  * semantics with `open()` throwing IOException for any file whose NAME is
  * in the poison set, on EVERY attempt. Models a permanently unreadable
  * sidecar (permission error, persistent device fault) as opposed to
  * [[CrashFileSystem]]'s crash-at-mutation and the transient read races
  * Sweep9Spec drives: a bounded-retry reader must eventually stop
  * retrying and fall through to its recovery path, not loop or
  * misreport.
  */
class ReadPoisonFileSystem extends RawLocalFileSystem {
  override def getScheme: String = ReadPoisonFileSystem.Scheme
  override def getUri: URI = URI.create(ReadPoisonFileSystem.Scheme + ":///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (ReadPoisonFileSystem.poisonNames.contains(f.getName)) {
      ReadPoisonFileSystem.attempts.incrementAndGet()
      throw new java.io.IOException(
        s"injected permanent read failure: $f (simulated permission denial)")
    }
    super.open(f, bufferSize)
  }
}

object ReadPoisonFileSystem {
  val Scheme = "graftreadpoison"

  @volatile var poisonNames: Set[String] = Set.empty
  val attempts = new java.util.concurrent.atomic.AtomicLong

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(s"fs.$Scheme.impl", classOf[ReadPoisonFileSystem].getName)
    hc.setBoolean(s"fs.$Scheme.impl.disable.cache", true)
  }
}
