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
    * per key. At least one column: a zero-column key would count
    * `count(*) − countDistinct(struct())` = rows − 1 — a nonsense number
    * reported as if it meant something.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "Unique needs at least one key column")
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
    *
    * Fully DECLARATIVE — one action evaluates everything: the row-local
    * checks AND each Unique (as `count(*) − count(distinct key-struct)`,
    * same number as distinct-then-count, rows with null key fields
    * included either way) share ONE aggregate pass whose single output
    * row unpivots to per-check rows via `explode(map(…))`; referential
    * checks union in as anti-join count rows (the broadcast 1-row
    * crossJoin supplies their n_rows). The pre-r10 shape ran `.head()`
    * plus one action PER set-level check — three sequential driver
    * round-trips where a validation gate needs one.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // names key the shared aggregate's output columns — a duplicate would
    // make the unpivot map emit one count for both
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).diff(checks.map(_.name).distinct)}")
    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: Matches) => c
    }
    val uniques = checks.collect { case u: Unique => u }
    val aggChecks = rowLocal ++ uniques
    // coalesce: sum(when(…)) over an EMPTY input is NULL, and a gate that
    // reports n_violations=NULL on an empty table reads as "unknown" where
    // the semantics are "zero rows, zero violations"
    val aggCols = rowLocal.map(c =>
        coalesce(violationExpr(c), lit(0L)).as(c.name)) ++
      uniques.map(u => (count(lit(1)) -
        countDistinct(struct(u.cols.map(col): _*))).as(u.name))
    val local = df.agg(count(lit(1)).as("__n"), aggCols: _*)
    // an aggChecks-empty map() would type as map<string,string> and poison
    // the union's n_violations column — short-circuit to refRows-only
    // check names are DATA-BORNE identifiers here (a Matches name embeds
    // its user-supplied regex): embedded backticks must double inside the
    // quoted reference or col() mis-parses — the FlowAnalyzer step-name
    // lesson, e.g. Matches("a", "x`y") used to crash the unpivot
    val localRows =
      if (aggChecks.isEmpty) None
      else Some(local.select(
        explode(map(aggChecks.flatMap(c =>
          Seq(lit(c.name), col(s"`${c.name.replace("`", "``")}`"))): _*))
          .as(Seq("check_name", "n_violations")),
        col("__n").as("n_rows")))
    val nRow = broadcast(local.select(col("__n").as("n_rows")))
    val refRows = checks.collect { case r: RefIntegrity =>
      df.select(col(r.col))
        .join(r.parent.select(col(r.parentCol).as(r.col)).distinct(),
          Seq(r.col), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("check_name"), col("n_violations"))
        .crossJoin(nRow)
    }
    val parts = localRows.toSeq ++ refRows
    if (parts.isEmpty)
      df.sparkSession.range(0).select(
        lit("").as("check_name"), lit(0L).as("n_violations"),
        lit(0L).as("n_rows"))
    else parts.reduce(_ unionByName _).orderBy("check_name")
  }
}
