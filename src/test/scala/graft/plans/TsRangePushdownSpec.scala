package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins [[TsRangePushdown]]: an epoch-range filter over the normalized
  * `events.ts` (a derived long column) must still reach the parquet
  * footer as a pushed filter on the RAW timestamp column — the scan
  * shape a 100 TB time-organized event table lives or dies by — and the
  * implied bound must never change results.
  */
class TsRangePushdownSpec extends SparkSpec {

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    scan.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse(scan)
  }

  test("epoch-range filter on normalized ts reaches the parquet scan") {
    val lo = 1_500_000_000_000_000_500L // deliberately NOT a µs multiple
    val q = Tables.load(spark, sf, "events")
      .filter(col("ts") >= lo && col("ts") < lo + 86_400_000_000_000L)
      .select("event_id")
    val pushed = pushedFilters(q)
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThanOrEqual(ts"), s"ts bound not pushed: $pushed")
  }

  test("implied bounds are supersets: results identical with the rule's rewrite") {
    // compare against the same filter evaluated on the fully-materialized
    // normalized column (collect + driver filter = rule-free ground truth)
    val lo = 1_600_000_000_000_000_001L
    val hi = 1_800_000_000_999_999_999L
    val all = Tables.load(spark, sf, "events")
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = all.collect {
      case (id, ts) if ts > lo && ts <= hi => id
    }.sorted.toSeq
    val got = Tables.load(spark, sf, "events")
      .filter(col("ts") > lo && col("ts") <= hi)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }

  test("equality on a non-µs-multiple adds no bound but stays correct") {
    val q = Tables.load(spark, sf, "events").filter(col("ts") === 1234567L)
    assert(q.count() == 0) // µs-encoded data can't carry sub-µs ns values
  }

  test("impliedBound math: every rewrite is implied, across signs and remainders") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val attr = AttributeReference("ts", TimestampNTZType)()
    val ns = Multiply(
      UnixMicros(Cast(attr, TimestampType, Some("UTC"))), Literal(1000L))
    def boundOf(e: Expression): Option[(String, Long)] =
      TsRangePushdown.impliedBound(e).map {
        case GreaterThanOrEqual(_, Literal(v: Long, TimestampNTZType)) => (">=", v)
        case LessThanOrEqual(_, Literal(v: Long, TimestampNTZType)) => ("<=", v)
        case EqualTo(_, Literal(v: Long, TimestampNTZType)) => ("=", v)
        case other => fail(s"unexpected bound shape $other")
      }
    // edge literals: negatives, exact multiples, both remainder signs
    val ls = Seq(-3001L, -3000L, -2999L, -1L, 0L, 1L, 999L, 1000L, 1001L,
      2999L, 3000L, Long.MaxValue - 5, Long.MinValue + 5)
    // µs values whose ns image brackets every literal above
    val usSet = (-5L to 5L) ++ Seq(Long.MaxValue / 1000, Long.MinValue / 1000)
    def holds(op: String, us: Long, bound: Long): Boolean = op match {
      case ">=" => us >= bound
      case "<=" => us <= bound
      case "="  => us == bound
    }
    for (l <- ls) {
      val cases: Seq[(Expression, Long => Boolean)] = Seq(
        (GreaterThanOrEqual(ns, Literal(l)), us => us * 1000 >= l),
        (GreaterThan(ns, Literal(l)), us => us * 1000 > l),
        (LessThanOrEqual(ns, Literal(l)), us => us * 1000 <= l),
        (LessThan(ns, Literal(l)), us => us * 1000 < l),
        (EqualTo(ns, Literal(l)), us => us * 1000 == l),
        // literal-first spellings flip the comparison direction
        (GreaterThan(Literal(l), ns), us => l > us * 1000),
        (LessThan(Literal(l), ns), us => l < us * 1000))
      for ((pred, truth) <- cases; (op, b) <- boundOf(pred); us <- usSet)
        // implication: wherever the exact predicate admits a row, the
        // pushed bound must admit it too (pruning must never drop rows)
        if (truth(us))
          assert(holds(op, us, b),
            s"bound $op $b drops us=$us satisfying $pred")
    }
    // equality on an exact multiple becomes an exact equality
    assert(boundOf(EqualTo(ns, Literal(3000L))) == Some(("=", 3L)))
    // equality on a non-multiple adds nothing
    assert(boundOf(EqualTo(ns, Literal(3001L))).isEmpty)
  }
}
