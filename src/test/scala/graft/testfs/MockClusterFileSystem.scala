package graft.testfs

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Local-disk Hadoop FileSystem registered under the NON-default scheme
  * `graftmock:` — the test stand-in for a cluster filesystem
  * (hdfs/s3a): its paths are unresolvable by `java.nio`/`java.io.File`
  * (which read them as relative files named "graftmock:…") and by a bare
  * `new Configuration()` (no `fs.graftmock.impl` outside the session
  * conf), so any sidecar/ledger/artifact code that bypasses the table
  * path's own filesystem — the exact r12 bug class — fails loudly here
  * instead of being masked by `file://` defaults. Like s3a, the scheme
  * deliberately has NO AbstractFileSystem binding, so FileContext-first
  * code paths exercise their UnsupportedFileSystemException fallbacks.
  */
class MockClusterFileSystem extends RawLocalFileSystem {
  override def getScheme: String = MockClusterFileSystem.Scheme
  override def getUri: URI = URI.create(MockClusterFileSystem.Scheme + ":///")
}

object MockClusterFileSystem {
  val Scheme = "graftmock"

  /** Register the scheme on `spark`'s Hadoop conf. Cache is DISABLED for
    * the scheme: with the global FileSystem cache on, an instance created
    * once through the session conf would be served to later lookups made
    * with a bare Configuration — letting the very bug the scheme exists
    * to catch pass spuriously.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(s"fs.$Scheme.impl", classOf[MockClusterFileSystem].getName)
    hc.setBoolean(s"fs.$Scheme.impl.disable.cache", true)
  }
}
