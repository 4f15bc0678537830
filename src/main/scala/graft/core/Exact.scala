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

  /** Order-independent SUM over a double expression. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Two-phase exact sum, phase 1: partial sum that KEEPS the decimal
    * accumulator, so a downstream re-aggregation ([[dsumMerge]]) is still
    * associative — the pair lets a query pre-aggregate at a finest
    * grouping and roll the (tiny) intermediate up to coarser groupings
    * without ever summing doubles. */
  def dsumPartial(c: Column): Column = sum(c.cast(Dec))

  /** Two-phase exact sum, phase 2: merge [[dsumPartial]] results and
    * surface the public double. */
  def dsumMerge(c: Column): Column = sum(c).cast(DoubleType)

  /** Order-independent AVG (exact sum / count). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact 2-decimal representation of a money/rate column. The testdata
    * money columns are 2-decimal-valued doubles (max deviation < 1e-9), so
    * this cast is unambiguous on both engines; downstream decimal products
    * are then exact rather than rounded-from-double.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** DuckDB-side equivalents for oracle SQL strings. */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,$Scale))) AS DOUBLE)"
  def sqlAvg(e: String): String = s"${sqlSum(e)} / COUNT(*)"
  def sqlMoney(e: String): String = s"CAST(($e) AS DECIMAL(18,2))"
}
