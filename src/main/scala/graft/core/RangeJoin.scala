package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval join: match points to `[start, end)` intervals on a
  * pure range predicate WITHOUT a cartesian/nested-loop plan.
  *
  * A naive `points.join(intervals, p >= s && p < e)` has no equi-condition,
  * so Spark plans BroadcastNestedLoopJoin (driver-OOM once the intervals
  * side is large) or a cartesian product — O(|P|·|I|) at any scale. The
  * classic fix is to discretize time into fixed buckets: an interval is
  * exploded onto every bucket it overlaps (≤ span/bucket + 1 rows), a point
  * maps to exactly ONE bucket, and the join becomes a plain shuffled
  * equi-join on the bucket id followed by the exact range filter. Because a
  * point lives in a single bucket, each qualifying (interval, point) pair is
  * produced exactly once — no dedup pass.
  *
  * Scale: shuffle volume is |P| + |I|·(span/bucket), both linear; the bucket
  * width trades interval replication against per-bucket fan-in and AQE's
  * skew-join splits hot buckets (a flash-crowd day) at runtime. The same
  * shape serves time intervals, numeric ranges and IP blocks; the reference
  * only needs the time variant (its per-run windows,
  * /root/reference/picoprobe/flow_analyzer.py:200-214, are joined in pandas
  * at single-node scale).
  */
object RangeJoin {

  /** Inner-join `points` into `intervals` where
    * `start <= point < end` (end-exclusive).
    *
    * `startCol`/`endCol`/`pointCol` must be non-negative integral columns in
    * a shared unit (e.g. epoch millis); column names must not collide
    * between the two frames. `bucket` is the discretization width in the
    * same unit. Empty/inverted intervals (`end <= start`) match nothing.
    */
  def intervalJoin(
      intervals: DataFrame, startCol: String, endCol: String,
      points: DataFrame, pointCol: String, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val b = "__range_bucket"
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(b, explode(sequence(
        expr(s"$startCol div $bucket"), expr(s"($endCol - 1) div $bucket"))))
    val pt = points.withColumn(b, expr(s"$pointCol div $bucket"))
    iv.join(pt, Seq(b))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(b)
  }
}
