package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Pins the events-load contract: whatever parquet timestamp encoding a
  * writer emits for `events.ts` — ns-epoch INT64 long, TIMESTAMP(NANOS),
  * TIMESTAMP(MICROS) isAdjustedToUTC=false (Spark TIMESTAMP_NTZ), or
  * TIMESTAMP(MICROS) isAdjustedToUTC=true (Spark TIMESTAMP) —
  * [[Tables.load]] must surface the SAME ns-epoch LONG column, and must do
  * so independent of `spark.sql.session.timeZone` (the DuckDB oracle
  * treats naive timestamps as epoch wall-clock, so any session-zone
  * dependence would silently shift results for non-UTC deployments).
  *
  * This is the regression gate for the round-5 board break, where a
  * testdata regeneration moved `ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and took out every epoch-arithmetic query at
  * analysis time.
  */
class TablesTsSpec extends SparkSpec {

  // Wall-clock instants with sub-second precision, expressed as µs since
  // epoch; every fixture encodes exactly these and must load back as
  // us * 1000 ns-longs.
  private val us: Seq[Long] = Seq(
    0L,                        // the epoch itself
    1_000_000L,                // +1 s
    1_614_834_367_123_456L,    // 2021-03-04T05:06:07.123456 (winter: CST −6)
    1_626_350_400_500_000L,    // 2021-07-15T12:00:00.5 — SUMMER: CDT −5.
                               // The non-UTC spec zone's offset differs
                               // from its 1970 offset here, so any
                               // conversion that round-trips through the
                               // session zone (even one that cancels a
                               // constant offset) shifts this value by
                               // the DST hour
    1_700_000_000_999_999L)    // sub-µs-boundary fraction

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ts-fixture").toString

  /** Run `body` with a non-UTC session zone (and restore), so any
    * zone-sensitive conversion inside the loader shows up as a value shift
    * against the zone-free expectations.
    */
  private def underNonUtc[A](body: => A): A = {
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "America/Chicago")
    try body finally spark.conf.set(key, prev)
  }

  private def assertLoadsAsNs(dir: String): Unit = {
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == LongType)
    val got = loaded.select("ts").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == us.map(_ * 1000L))
    // epoch arithmetic — the exact shape that died at analysis in round 5
    val hrs = loaded.select((col("ts") / lit(1000L)).cast("long").as("us"))
      .agg(max("us")).head().getLong(0)
    assert(hrs == us.max)
  }

  test("ns-epoch long ts passes through untouched") {
    val dir = freshDir()
    import spark.implicits._
    us.map(u => (u * 1000L, "click")).toDF("ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    underNonUtc { assertLoadsAsNs(dir) }
  }

  test("TIMESTAMP(MICROS) NTZ ts normalizes to ns-long, zone-invariant") {
    val dir = freshDir()
    import spark.implicits._
    // LocalDateTime encodes as TimestampNTZType; constructed at a fixed
    // UTC offset so the wall clock is the zone-free expectation
    us.map { u =>
      (LocalDateTime.ofEpochSecond(
        Math.floorDiv(u, 1_000_000L),
        (Math.floorMod(u, 1_000_000L) * 1000L).toInt, ZoneOffset.UTC), "click")
    }.toDF("ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    underNonUtc { assertLoadsAsNs(dir) }
  }

  test("TIMESTAMP(MICROS) adjusted-to-UTC ts normalizes to ns-long, zone-invariant") {
    val dir = freshDir()
    import spark.implicits._
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS") // annotated µs, isAdjustedToUTC=true
    try
      us.map(u => (Instant.ofEpochSecond(
          Math.floorDiv(u, 1_000_000L),
          Math.floorMod(u, 1_000_000L) * 1000L), "click"))
        .toDF("ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set(key, prev)
    underNonUtc { assertLoadsAsNs(dir) }
  }

  test("TIMESTAMP(NANOS) ts reads as ns-long via scoped nanosAsLong fallback") {
    // Spark cannot WRITE nanos parquet; emit the fixture with parquet-mr,
    // the same INT64/TimestampType(NANOS) annotation the round-1..4
    // testdata carried.
    val dir = freshDir()
    new java.io.File(s"$dir/events.parquet").getParentFile.mkdirs()
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try us.foreach(u => writer.write(factory.newGroup().append("ts", u * 1000L)))
    finally writer.close()
    // The fallback must be per-read: the caller session's conf is never
    // written (the flag travels with the isolated session captured by the
    // relation), so a nanos load cannot change behavior of unrelated reads.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    underNonUtc { assertLoadsAsNs(dir) }
    assert(spark.conf.getOption(key) == before,
      "nanos fallback mutated the caller session's conf")
  }
}
