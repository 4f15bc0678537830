package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent (bit-exact) double aggregation.
  *
  * A plain `sum(double)` is accumulation-order dependent, so a distributed
  * Spark sum and a single-threaded oracle disagree in the last ulps and a
  * value-hash compare fails. Routing the sum through a fixed-scale decimal
  * makes it associative and therefore bit-identical on any partitioning —
  * the property that also keeps results stable when a job is re-run on a
  * 1000-executor cluster. The per-row double arithmetic (products etc.) is
  * IEEE-deterministic on both engines, so only the *aggregation* needs the
  * decimal detour. Final cast back to double keeps the public schema simple.
  */
object Exact {

  /** Decimal scale used for the exact detour: 4 fractional digits covers
    * the 2-decimal money columns and quantity/discount/tax products.
    *
    * Considered and rejected: summing as scaled `LongType` (cents) is a
    * few× cheaper per row but overflows at target scale — a scale-6
    * product (price·(1−disc)·(1+tax)) is ~1e11 scaled units, and summing
    * 1e9+ rows exceeds the Long range, silently with ANSI off. Decimal
    * (30,4) keeps the same bit-exact result with 12 spare integer digits.
    */
  val Scale = 4
  private val Dec = DecimalType(30, Scale)

  /** Split-long accumulator base. A scale-4 value splits per row into
    * `hi = u div 1e6` and `lo = u % 1e6` of its scaled-integer
    * `u = value·10⁴`; both halves SUM as plain longs (codegen'd,
    * map-side combined — no per-row BigDecimal in the aggregation
    * buffer, measured ~2× faster than summing Decimal(30,4), whose
    * 40-digit sum buffer leaves Spark's compact-long decimal path) and
    * recombine exactly: `Σu = (Σhi)·1e6 + Σlo` because Java-truncating
    * `div`/`%` satisfy `u = (u div b)·b + (u % b)` for every sign, and
    * each half's sum is exact integer arithmetic far from Long range
    * (per row |lo| < 1e6 and |hi| ≤ 9.2e8, so ~9e12 rows per GROUP
    * before either half could overflow — 100 TB-safe; the recombination
    * runs in Decimal(38) on one tiny row per group). */
  private val SplitBase = 1000000L

  /** Per-row scaled-integer value: round-half-up(c·10^scale) as a LONG,
    * through the SAME `cast(DecimalType(30, scale))` as the wide path —
    * the rounding is bit-identical by construction. Envelope: per-row
    * |c| < Long.MaxValue/10^scale (9.2e14 at scale 4, 9.2e12 at scale
    * 6); beyond that the long cast FAILS LOUDLY under the session's
    * default ANSI semantics (CAST_OVERFLOW — never a silent wrong sum),
    * so callers summing columns that can exceed it (sum-of-SQUARES
    * shapes over ~1e9-magnitude spans do; no money/rate/quantity column
    * does — they sit ≥ 6 orders below) must use [[dsumWide]]. */
  private def scaledLong(c: Column, scale: Int): Column =
    (c.cast(DecimalType(30, scale)) * lit(math.pow(10, scale).toLong))
      .cast(org.apache.spark.sql.types.LongType)

  private def intDiv(a: Column, b: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(lit(b))))
  }

  /** The exact SUM of `c` at `scale`, reassembled from the split-long
    * sums; value-identical (hence bit-identical after any cast) to
    * `sum(c.cast(DecimalType(30, scale)))`. Null when the group has no
    * non-null rows — both halves' sums are null together, and the
    * recombination propagates it — matching plain SUM. */
  private def splitSum(c: Column, scale: Int = Scale): Column =
    splitSumUnits(scaledLong(c, scale), scale)

  /** Split-long SUM over an ALREADY-SCALED long expression `u` (scaled
    * units = value·10^scale), recombined exactly — the shared tail of
    * [[splitSum]] and the [[dsumUnits]] fast path. */
  private def splitSumUnits(u: Column, scale: Int): Column =
    (sum(intDiv(u, SplitBase)).cast(DecimalType(38, 0)) * lit(SplitBase) +
      sum(u % SplitBase)).cast(DecimalType(38, scale)) /
      lit(math.pow(10, scale).toLong)

  /** Order-independent SUM over a double expression. */
  def dsum(c: Column): Column = splitSum(c).cast(DoubleType)

  /** Order-independent SUM via a Decimal(30,4) accumulator — the wide
    * path for values outside [[scaledLong]]'s ±9.2e14 per-row envelope.
    * Same result as [[dsum]] inside the envelope, a few× slower. */
  def dsumWide(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Per-row scaled units of a 2-decimal money/rate column as a LONG
    * (cents): the SAME rounding as [[money]]'s Decimal(18,2) cast, by
    * construction (it goes through the identical decimal cast). A
    * product of two such columns is then an exact scale-4 integer in
    * pure long arithmetic — see [[dsumUnits]]. Envelope: |c| < 9.2e16
    * per row (the scale-2 [[scaledLong]] bound). */
  def moneyUnits(c: Column): Column = scaledLong(c, 2)

  /** Order-independent SUM over an ALREADY-SCALED long expression
    * (`u = value·10^scale`, e.g. a product of [[moneyUnits]] factors:
    * scale 4 for a two-factor money product, 6 for three factors) —
    * value-identical to routing the same product through the decimal
    * path (`dsumScaled(money(a)·money(b), 4)`), because the scaled-unit
    * integers are identical: a scale-2 decimal product has scale 4
    * exactly, so its scaledLong IS the product of the factors' cent
    * units. The win is per-row cost — the wide Decimal multiply
    * (precision 37+, BigDecimal-backed, allocation per row) is replaced
    * by one long multiply; the aggregation was already split-long.
    * Overflow envelope: |u| must stay under ±9.2e18 per ROW (a money
    * product of |a| ≤ 1e7 cents and |b| ≤ 1e4 units is 1e11 — 7 orders
    * of headroom) and the per-group split sums carry ~9e12 rows as in
    * [[dsum]]. */
  def dsumUnits(u: Column, scale: Int): Column =
    splitSumUnits(u, scale).cast(DoubleType)

  /** Order-independent SUM of an already-exact DECIMAL expression at an
    * explicit scale (money products are scale 4; the ·(1+tax) charge
    * shape is scale 6) — value-identical to `sum(c).cast(DoubleType)`
    * when `c`'s values carry at most `scale` fractional digits, through
    * the same split-long accumulator as [[dsum]]. */
  def dsumScaled(c: Column, scale: Int): Column =
    splitSum(c, scale).cast(DoubleType)

  /** Two-phase exact sum, phase 1: partial sum that KEEPS the decimal
    * accumulator, so a downstream re-aggregation ([[dsumMerge]]) is still
    * associative — the pair lets a query pre-aggregate at a finest
    * grouping and roll the (tiny) intermediate up to coarser groupings
    * without ever summing doubles. (Internally the split-long sums do
    * the heavy per-row work; the decimal only materializes once per
    * finest-group row.) */
  def dsumPartial(c: Column): Column = splitSum(c).cast(Dec)

  /** Two-phase exact sum, phase 2: merge [[dsumPartial]] results and
    * surface the public double. */
  def dsumMerge(c: Column): Column = sum(c).cast(DoubleType)

  /** Order-independent AVG (exact sum / count). */
  // divide by count(c), not count(*): dsum skips nulls, so an all-rows
  // denominator would silently report sum/N instead of AVG's sum/N_nonnull
  // on a null-bearing column (the SQL mirror below matches)
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact 2-decimal representation of a money/rate column. The testdata
    * money columns are 2-decimal-valued doubles (max deviation < 1e-9), so
    * this cast is unambiguous on both engines; downstream decimal products
    * are then exact rather than rounded-from-double.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** DuckDB-side equivalents for oracle SQL strings. */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,$Scale))) AS DOUBLE)"
  def sqlAvg(e: String): String = s"${sqlSum(e)} / COUNT(($e))"
  def sqlMoney(e: String): String = s"CAST(($e) AS DECIMAL(18,2))"
}
