package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over a scale-factor directory
  * (see /root/repo/TESTDATA.md).
  *
  * All loads go through `spark.read.parquet` so Catalyst pushes filters and
  * prunes columns at the scan (verify via `.explain`: `PushedFilters`,
  * `ReadSchema`). At 100 TB the same call reads a partitioned parquet/Delta
  * layout; nothing here assumes single-file tables.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join candidates. */
  val dims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by default;
    // read it as a ns-epoch long — the same representation the reference's
    // transitions.state_time uses (ns since epoch, SURVEY.md §1.1).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view for `spark.sql` surfaces. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Load + spread across all cores — but only when the scan is narrower
    * than the cluster. For CPU-heavy derivations (shingle hashing, minhash,
    * embeddings) over a table whose split count is below the core count,
    * every expensive expression upstream of the first shuffle runs on too
    * few cores, so a cheap round-robin shuffle of the raw rows pays for
    * itself. At production scale the scan already has more splits than
    * cores and the repartition would be a pure extra shuffle of every input
    * byte — so it is gated on the scan's actual partition count (asking the
    * physical plan for its partitioning runs no job).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
