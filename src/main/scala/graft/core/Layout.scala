package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout utilities — the write-side half of scan
  * performance at 100 TB. Parquet pruning works on per-file/row-group
  * min-max statistics, and those statistics only prune when the writer
  * CLUSTERED the data: a key-range filter over randomly-laid-out files
  * reads everything, the same filter over range-laid-out files reads one
  * file per touched range.
  */
object Layout {

  /** Write `df` range-clustered on `keyCol`: rows range-partition into
    * `nFiles` contiguous key ranges (sampled split points — Spark's
    * `RangePartitioner`) and sort within each partition, so every output
    * file covers a key interval DISJOINT from every other file. A
    * `keyCol BETWEEN a AND b` scan then prunes to the overlapping files
    * via footer statistics alone.
    */
  def writeRangeLayout(df: DataFrame, keyCol: String, nFiles: Int,
      path: String): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)

  /** Compact a directory of (typically many small) parquet files into
    * ~`targetFileBytes` outputs — the maintenance pass every long-lived
    * ingest needs: streaming sinks and per-batch writers accrete small
    * files, and at scale file-open overhead dominates scans of such
    * tables. Output file count is computed from the INPUT's on-disk bytes
    * (compressed), so the compaction is a single narrow-when-shrinking
    * repartition + rewrite. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // Hadoop FS, not java.io — the same call works on HDFS/S3/local
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val parts = parquetFiles(inPath)
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (parts.length, parquetFiles(outPath).length)
  }
}
