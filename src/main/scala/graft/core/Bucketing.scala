package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY §4 / the 100 TB join playbook):
  * persisting both sides of a recurring join bucketed (and sorted) by the
  * join key lets every subsequent join run exchange-free — each task reads
  * matching buckets from both tables, so the shuffle is paid ONCE at write
  * time and amortized over every downstream join, aggregation, or merge on
  * that key.
  *
  * This is the static counterpart of [[Skew.saltedJoin]] (runtime
  * balance) and AQE (runtime re-planning): layout decided at ingest. The
  * spec pins the property that matters — a join of two co-bucketed tables
  * plans with NO Exchange on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. Bucket
    * count should be sized so one bucket of the LARGER table fits an
    * executor's scan budget (~128-512 MB at production scale).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, sortKeys: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key — plans without a
    * shuffle when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
