package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rule-level pins for [[DerivedPartitionPushdown]]: bound arithmetic
  * (floors, exclusive-edge sharpening), literal-first spellings,
  * idempotence, and the two no-fire guards (unregistered path, wrong
  * column types) — the registry is what makes the rewrite sound, so a
  * misfire on an unregistered store would be a correctness bug, not a
  * missed optimization.
  */
class DerivedPartitionPushdownSpec extends SparkSpec {

  private val NsPerDay = 86_400_000_000_000L

  /** A tiny registered day-partitioned store over synthetic epochs. */
  private lazy val registeredPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("dpp-spec").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    // 10 days, 4 rows each, at 00:00 / 06:00 / 12:00 / 18:00
    (0 until 40).map { i =>
      val ts = (i / 4).toLong * NsPerDay + (i % 4).toLong * (NsPerDay / 4)
      (i.toLong, ts)
    }.toDF("id", "ts")
      .withColumn("event_day",
        date_add(to_date(lit("1970-01-01")),
          expr(s"cast(ts div $NsPerDay as int)")))
      .write.partitionBy("event_day").parquet(path)
    DerivedPartitions.register(path)
    path
  }

  private def partitionFilterLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("PartitionFilters")).get

  test("inclusive bounds floor to the containing day") {
    val df = spark.read.parquet(registeredPath)
      .filter(col("ts") >= 2 * NsPerDay + 1 && col("ts") <= 5 * NsPerDay + 1)
    val pf = partitionFilterLine(df)
    assert(pf.contains("1970-01-03") && pf.contains("1970-01-06"), pf)
    // day 2: 06/12/18h (3 rows), days 3-4: 4 each, day 5: 00:00 only
    assert(df.count() == 12)
  }

  test("exclusive edges sharpen: ts < midnight excludes the whole next day") {
    val df = spark.read.parquet(registeredPath)
      .filter(col("ts") >= 2 * NsPerDay && col("ts") < 5 * NsPerDay)
    val pf = partitionFilterLine(df)
    // upper day must be day 4 (1970-01-05), NOT day 5
    assert(pf.contains("1970-01-05"), pf)
    assert(!pf.contains("1970-01-06"), pf)
    assert(df.count() == 12)
  }

  test("literal-first spellings rewrite identically") {
    val a = spark.read.parquet(registeredPath)
      .filter(lit(3 * NsPerDay) <= col("ts") && lit(5 * NsPerDay) > col("ts"))
    val pf = partitionFilterLine(a)
    assert(pf.contains("1970-01-04") && pf.contains("1970-01-05"), pf)
    assert(a.count() == 8)
  }

  test("equality maps to a single day partition") {
    val df = spark.read.parquet(registeredPath)
      .filter(col("ts") === (4 * NsPerDay + NsPerDay / 2))
    val pf = partitionFilterLine(df)
    assert(pf.contains("= 1970-01-05"), pf)
    assert(!pf.contains(">=") && !pf.contains("<="), pf)
    assert(df.count() == 1)
  }

  test("idempotent: optimizing twice adds no duplicate bounds") {
    val df = spark.read.parquet(registeredPath)
      .filter(col("ts") >= 2 * NsPerDay && col("ts") < 5 * NsPerDay)
    val optimized = df.queryExecution.optimizedPlan
    val again = DerivedPartitionPushdown(optimized)
    assert(again.fastEquals(optimized),
      s"rule re-fired on an optimized plan:\n$again")
  }

  test("sidecar metadata: a cold-registry session prunes from _graft_meta.json") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-meta").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    (0 until 40).map { i =>
      val ts = (i / 4).toLong * NsPerDay + (i % 4).toLong * (NsPerDay / 4)
      (i.toLong, ts)
    }.toDF("id", "ts")
      .withColumn("event_day",
        date_add(to_date(lit("1970-01-01")),
          expr(s"cast(ts div $NsPerDay as int)")))
      .write.partitionBy("event_day").parquet(path)
    // writer-persisted contract ONLY — no register() call: this is the
    // fresh-cluster path where the in-memory registry is cold
    DerivedPartitions.persist(path, spark.sessionState.newHadoopConf())
    val df = spark.read.parquet(path)
      .filter(col("ts") >= 2 * NsPerDay && col("ts") < 5 * NsPerDay)
    val pf = partitionFilterLine(df)
    assert(pf.contains("1970-01-03") && pf.contains("1970-01-05"), pf)
    assert(df.count() == 12)
  }

  test("sidecar without the contract key does not fire (and is negative-cached)") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-meta-bad").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    (0 until 10).map(i => (i.toLong * NsPerDay, s"1970-01-${"%02d".format(i + 1)}"))
      .toDF("ts", "event_day")
      .write.partitionBy("event_day").parquet(path)
    // a sidecar that is NOT a derivation contract (foreign tool's file)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, DerivedPartitions.MetaFile),
      """{"writer":"other-tool","version":3}""")
    val df = spark.read.parquet(path).filter(col("ts") >= 3 * NsPerDay)
    val pf = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("PartitionFilters"))
    assert(pf.forall(l => !l.contains("event_day") || l.contains("[]")),
      pf.getOrElse(""))
    assert(df.count() == 7)
  }

  test("sidecar that the data no longer satisfies does not fire (spot-check)") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-meta-drift").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    // event_day is NOT derived from ts — the shape of a table rewritten
    // in place by a non-Spark tool under a left-behind contract sidecar.
    // Pruning on the stale contract would silently drop rows.
    (0 until 10).map(i => (i.toLong * NsPerDay, s"2030-05-${10 + i}"))
      .toDF("ts", "event_day")
      .write.partitionBy("event_day").parquet(path)
    DerivedPartitions.persist(path, spark.sessionState.newHadoopConf())
    val df = spark.read.parquet(path).filter(col("ts") >= 3 * NsPerDay)
    val pf = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("PartitionFilters"))
    assert(pf.forall(l => !l.contains("event_day") || l.contains("[]")),
      pf.getOrElse(""))
    assert(df.count() == 7)
  }

  test("sidecar over an unpartitioned layout does not fire (no day dirs to check)") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-meta-flat").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    // event_day is a DATA column (no hive-style dayCol= directories) and
    // NOT derived from ts — a left-behind contract over a table whose
    // layout was flattened by a rewrite. The spot-check finds no
    // dayCol= directory and must fail closed; a misfire would inject an
    // event_day bound that drops rows.
    (0 until 10).map(i => (i.toLong * NsPerDay, s"2030-05-${10 + i}"))
      .toDF("ts", "event_day")
      .write.parquet(path)
    DerivedPartitions.persist(path, spark.sessionState.newHadoopConf())
    val df = spark.read.parquet(path).filter(col("ts") >= 3 * NsPerDay)
    val filterConds = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }
    assert(filterConds.forall(!_.contains("event_day")), filterConds)
    assert(df.count() == 7)
  }

  test("sidecar over a stats-less parquet file does not fire (nothing to vouch)") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-meta-nostat").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    // derivation actually HOLDS here, but the footer carries no column
    // statistics to verify it with — the spot-check must stay fail-closed
    // (absence of evidence is not a pass), costing only the pruning
    (0 until 40).map { i =>
      val ts = (i / 4).toLong * NsPerDay + (i % 4).toLong * (NsPerDay / 4)
      (i.toLong, ts)
    }.toDF("id", "ts")
      .withColumn("event_day",
        date_add(to_date(lit("1970-01-01")),
          expr(s"cast(ts div $NsPerDay as int)")))
      .write.option("parquet.column.statistics.enabled", "false")
      .partitionBy("event_day").parquet(path)
    // precondition: the writer really dropped the ts stats (else this
    // test silently degrades into the happy path)
    locally {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val file = fs.listStatus(new org.apache.hadoop.fs.Path(path)).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_day="))
        .flatMap(d => fs.listStatus(d.getPath).iterator)
        .find(s => s.isFile && s.getPath.getName.endsWith(".parquet")).get
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          file.getPath, fs.getConf))
      try {
        import scala.jdk.CollectionConverters._
        val tsStats = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "ts").map(_.getStatistics)
        assert(tsStats.forall(s => s == null || s.isEmpty),
          s"precondition failed: writer kept ts statistics ($tsStats)")
      } finally reader.close()
    }
    DerivedPartitions.persist(path, spark.sessionState.newHadoopConf())
    val df = spark.read.parquet(path)
      .filter(col("ts") >= 2 * NsPerDay && col("ts") < 5 * NsPerDay)
    val pf = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("PartitionFilters"))
    assert(pf.forall(l => !l.contains(">=") && !l.contains("<=")),
      pf.getOrElse(""))
    assert(df.count() == 12)
  }

  test("no-fire: unregistered path with identical column names") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-noreg").toString
    val path = s"$dir/t"
    val session = spark
    import session.implicits._
    // event_day here is NOT derived from ts — a rewrite would be WRONG
    (0 until 10).map(i => (i.toLong * NsPerDay, s"2030-05-${10 + i}"))
      .toDF("ts", "event_day")
      .write.partitionBy("event_day").parquet(path)
    val df = spark.read.parquet(path).filter(col("ts") >= 3 * NsPerDay)
    val pf = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("PartitionFilters"))
    assert(pf.forall(l => !l.contains("event_day") || l.contains("[]")),
      pf.getOrElse(""))
    assert(df.count() == 7)
  }

  test("lookup refuses a multi-root relation unless EVERY root vouches") {
    // the rule consumes lookup(rootPaths): first-match semantics would let
    // one vouched root speak for an unvouched sibling in a multi-path
    // read, and pruning the whole relation on its contract silently drops
    // the sibling's rows (its event_day need not be utc_day(ts))
    val conf = spark.sessionState.newHadoopConf()
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val unvouched = java.nio.file.Files
      .createTempDirectory("dpp-unvouched").toString
    // vouched alone: contract resolves
    assert(DerivedPartitions.lookup(Seq(p(registeredPath)), conf).isDefined)
    // vouched + unvouched sibling: refused, regardless of order
    assert(DerivedPartitions.lookup(
      Seq(p(registeredPath), p(unvouched)), conf).isEmpty)
    assert(DerivedPartitions.lookup(
      Seq(p(unvouched), p(registeredPath)), conf).isEmpty)
    // two vouched roots with the SAME contract: resolves
    assert(DerivedPartitions.lookup(
      Seq(p(registeredPath), p(registeredPath)), conf).isDefined)
    // two vouched roots with DIFFERENT contracts: refused
    val other = java.nio.file.Files
      .createTempDirectory("dpp-othercontract").toString
    DerivedPartitions.register(other, tsCol = "created_ns", dayCol = "day")
    assert(DerivedPartitions.lookup(
      Seq(p(registeredPath), p(other)), conf).isEmpty)
  }

  test("no-crash: filter above an operator that pruned the partition column") {
    import org.apache.spark.sql.expressions.Window
    // the ts filter cannot push below the window, so the Filter's child
    // outputs only (ts, bucket, rn) — no event_day. The rule must leave
    // the Filter alone instead of referencing a pruned attribute.
    val df = spark.read.parquet(registeredPath)
      .select(col("ts"), (col("id") % 2).as("bucket"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("bucket").orderBy("ts")))
      .filter(col("ts") >= 3 * NsPerDay)
    assert(df.count() == 28) // days 3-9, 4 rows each
  }

  test("two conjuncts implying the same day add ONE bound") {
    // ts >= L and ts > L-1 both imply day >= dayOf(L)
    val df = spark.read.parquet(registeredPath)
      .filter(col("ts") >= 3 * NsPerDay && col("ts") > 3 * NsPerDay - 1)
    val pf = partitionFilterLine(df)
    val hits = "1970-01-04".r.findAllIn(pf).size
    assert(hits == 1, pf)
    assert(df.count() == 28)
  }
}
