package graft.core

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Committed-data probe for "does this table exist yet?" decisions.
  *
  * `fs.exists(dir)` — and even `listStatus(dir).nonEmpty` — are the wrong
  * question: a directory can exist holding NOTHING a reader can use
  * (pre-created by an operator, or the `_temporary` / `.spark-staging-*`
  * leftovers of a crashed FIRST write). Feeding such a directory to
  * `spark.read.parquet` throws UNABLE_TO_INFER_SCHEMA, and a pipeline
  * that probes existence this way is then permanently WEDGED: every
  * retry sees "exists", tries to read, and dies — the crash-fuzz found
  * exactly this on `Catalog.publish` (a crash during the first publish's
  * job setup left only `_temporary`, and no later publish could run).
  */
object DataDir {

  /** True when `dir` holds at least one visible (committed) data file —
    * files under `_`/`.`-prefixed names (committer scratch, markers,
    * staging) don't count, at any depth.
    */
  def nonEmpty(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(st: FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") &&
        (st.isFile || fs.listStatus(st.getPath).exists(visible))
    }
    fs.exists(p) && fs.listStatus(p).exists(visible)
  }
}
