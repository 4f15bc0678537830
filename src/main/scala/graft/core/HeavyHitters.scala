package graft.core

import graft.expressions.CountMin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters (all keys with count ≥ threshold) with a
  * Count-Min-sketch prefilter — the frequency analog of
  * [[BloomJoin]]'s sketch-prune → exact-verify pattern.
  *
  * A plain `groupBy(key).count.filter(n >= t)` shuffles EVERY key
  * occurrence; when heavy keys are rare (the normal case — frequency
  * mining, hot-key detection, stopword discovery), almost all of that
  * exchange is rows whose key could never reach the threshold. The CMS
  * grid is a fixed-size aggregate (depth·width longs regardless of input
  * size) built in one pre-pass; its point estimates NEVER UNDERCOUNT, so
  * probing it at the scan (one codegen call per row, no exchange crossed)
  * prunes cold rows while provably keeping every row of every truly-heavy
  * key. The exact recount downstream then makes the final counts — and
  * therefore the result — IDENTICAL to the plain formulation, which is
  * how q32's oracle verifies it. Overcounted (collided) cold keys only
  * cost recount shuffle; sizing keeps the expected collision error
  * (rows/width per grid row) far below any useful threshold.
  *
  * The two corpus scans are the textbook trade: at 100 TB, scan #1 is a
  * narrow key-only projection feeding a partial aggregate (no exchange —
  * grids merge by element-wise addition), while the avoided full-key
  * shuffle is the dominant cost of the naive plan.
  */
object HeavyHitters {

  /** Keys of `df` whose exact occurrence count is ≥ `threshold(total)`,
    * with their exact counts in column `n`. `threshold` derives the cut
    * from the total row count (data-derived thresholds stay meaningful
    * at any scale factor).
    */
  def exact(df: DataFrame, keyCol: String, threshold: Long => Long,
      width: Int = 1 << 13, depth: Int = 4): DataFrame = {
    val keyed = df.select(col(keyCol), xxhash64(col(keyCol)).as("__h"))
    val head = keyed.agg(
      CountMin.cmsState(col("__h"), width, depth).as("sk"),
      count(lit(1)).as("total")).head()
    val grid = head.getAs[Array[Byte]](0)
    val thr = threshold(head.getLong(1))
    keyed
      .filter(CountMin.cmsEstimate(col("__h"), grid, width, depth) >= thr)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
  }
}
