package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the validation gate a pipeline
  * runs before promoting a snapshot (the Deequ/dbt-test shape): declare
  * what must hold, get one violations report back, fail the batch when a
  * hard constraint breaks.
  *
  * Evaluation cost at 100 TB: every ROW-LOCAL check (null, range,
  * pattern) folds into ONE shared aggregate pass — adding a tenth check
  * adds a conditional sum, not a scan. Set-level checks cost what they
  * fundamentally cost: uniqueness one keyed aggregate, referential
  * integrity one anti-join against the (usually broadcastable) parent
  * keys — and report through the same (check, violations, rows) schema.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }

  /** Column must fall in [lo, hi] (nulls are NotNull's job). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col[$lo,$hi]"
  }

  /** Column must match a regex (nulls ignored). The name embeds the
    * pattern (as InRange embeds its bounds): two Matches on the same
    * column with different regexes must not collide in the shared
    * aggregate, where getAs-by-name would silently read one count for
    * both.
    */
  final case class Matches(col: String, pattern: String) extends Check {
    def name = s"matches:$col:$pattern"
  }

  /** The column tuple must be unique; violations = rows in excess of one
    * per key.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Every value of `col` must exist in `parent`'s `parentCol`. */
  final case class RefIntegrity(col: String, parent: DataFrame,
      parentCol: String) extends Check {
    def name = s"ref:$col"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(col0) => sum(when(col(col0).isNull, 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi), 1L)
        .otherwise(0L))
    case Matches(col0, p) =>
      sum(when(col(col0).isNotNull && !col(col0).rlike(p), 1L).otherwise(0L))
    case _ => lit(0L)
  }

  /** Evaluate all checks; returns (check_name, n_violations, n_rows) with one
    * row per check, deterministic order by check name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // names key the shared aggregate's output columns — a duplicate would
    // make getAs-by-name resolve both to one count
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).diff(checks.map(_.name).distinct)}")
    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: Matches) => c
    }
    val head = df.agg(count(lit(1)).as("__n"),
      rowLocal.map(c => violationExpr(c).as(c.name)): _*).head()
    val nRows = head.getAs[Long]("__n")
    val localRows = rowLocal.map(c => (c.name, head.getAs[Long](c.name), nRows))

    val setRows = checks.collect {
      case u: Unique =>
        val excess = nRows - df.select(u.cols.map(col): _*).distinct().count()
        (u.name, excess, nRows)
      case r: RefIntegrity =>
        val orphans = df.select(col(r.col))
          .join(r.parent.select(col(r.parentCol).as(r.col)).distinct(),
            Seq(r.col), "left_anti")
          .count()
        (r.name, orphans, nRows)
    }
    (localRows ++ setRows).toDF("check_name", "n_violations", "n_rows")
      .orderBy("check_name")
  }
}
