package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT per-group ranks — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(v))`, whose physical
  * plan sorts each group's entire slice on ONE reducer (with |g|=3 groups
  * on a 100 TB fact table that is three reducers each sorting a third of
  * the corpus).
  *
  * Two fully-parallel passes instead:
  *
  *   1. bucket every row by a deterministic MONOTONE function of the value
  *      (fixed-width range cells, clamped at both ends), count rows per
  *      (group, bucket) — one map-side-combined aggregate whose output is
  *      |g|·B rows, tiny;
  *   2. prefix-sum those counts per group into bucket OFFSETS (a window
  *      over the tiny counts table only), broadcast them back, and rank
  *      WITHIN each (group, bucket) cell — parallelism |g|·B, every sort
  *      bounded by the densest cell, never by the group.
  *
  * global rank = bucket offset + within-bucket rank. Exactness does not
  * depend on the bucket boundaries (any monotone bucketing yields the
  * same rank for every row — ties collapse to equal values, and the value
  * at a given rank is unique even when tie order is not); the boundaries
  * only steer BALANCE. A production deployment at unknown value ranges
  * would sample boundaries the way Spark's RangePartitioner does; fixed
  * deterministic cells keep the result reproducible run to run here.
  */
object Ranks {

  /** Exact ORDER STATISTICS — the interpolated value at each fractional
    * position `p` (PERCENTILE_CONT semantics: pos = p·(n−1)+1, linear
    * interpolation between the two bracketing ranks) per group, WITHOUT
    * materializing per-row ranks at all:
    *
    *   1. per-(group, cell) counts — one map-side-combined aggregate,
    *      |g|·B rows, collected (bounded driver state, the IVF-model
    *      precedent);
    *   2. the driver locates, per target rank, WHICH cell holds it and
    *      the rank within that cell — pure integer arithmetic on counts;
    *   3. only rows in target cells are ranked (a window over ≤ the
    *      densest-cell rows per target), everything else is filtered out
    *      before any shuffle.
    *
    * The full table is never shuffled — the three passes over it are a
    * counts aggregate, a cell-filtered scan, and whatever the caller does
    * next; compare [[valueBucketed]], which must shuffle every row into
    * its (group, cell) to attach a rank. Use this when only quantile
    * VALUES are needed (q31/q41/q47); use valueBucketed when every row
    * needs its rank. Exactness is bucket-independent as above: target
    * ranks select the same values under any monotone bucketing, tie
    * order never changes the value at a rank, and the interpolation
    * arithmetic (computed in Spark columns on the tiny result, identical
    * IEEE steps to the oracle's) is unchanged.
    *
    * Returns one row per (g, p): columns (`g`, "p", "q").
    */
  def orderStatistics(df: DataFrame, g: String, v: String, buckets: Int,
      vLo: Double, vHi: Double, ps: Seq[Double]): DataFrame = {
    // ps outside [0,1] would send locate() past the last cell and
    // MatchError on the driver mid-collect — reject up front
    require(buckets > 0 && vHi > vLo && ps.nonEmpty &&
      ps.forall(p => p >= 0.0 && p <= 1.0),
      s"buckets=$buckets, [$vLo,$vHi), ps=$ps")
    val spark = df.sparkSession
    import spark.implicits._
    val width = (vHi - vLo) / buckets
    // nulls are EXCLUDED, matching PERCENTILE_CONT semantics — without the
    // filter a null v would produce a null __b and NPE at the driver unbox
    val withB = df.select(col(g).cast("string").as("g"),
        col(v).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("__b", least(
        greatest(floor((col("v") - lit(vLo)) / lit(width)), lit(0.0)),
        lit((buckets - 1).toDouble)).cast("int"))

    // pass 1: counts; driver-side offsets per group (sorted by cell)
    val counts = withB.groupBy("g", "__b").agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("__b"), r.getAs[Long]("__c")))
      .groupBy(_._1)
      .map { case (grp, rows) =>
        grp -> rows.sortBy(_._2).map(r => (r._2, r._3))
      }

    // pass 2 targets: (g, cell, withinRank, p, role 0=lo/1=hi, pos)
    val targets = counts.toSeq.flatMap { case (grp, cells) =>
      val n = cells.map(_._2).sum
      def locate(rank: Long): (Int, Long) = {
        var off = 0L
        var res: (Int, Long) = null
        val it = cells.iterator
        while (it.hasNext && res == null) {
          val (b, c) = it.next()
          if (rank <= off + c) res = (b, rank - off) else off += c
        }
        res // non-null for every 1 <= rank <= n
      }
      ps.flatMap { p =>
        val pos = p * (n - 1) + 1 // same IEEE steps as the SQL oracle
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val (bl, wl) = locate(lo)
        val (bh, wh) = locate(hi)
        Seq((grp, bl, wl, p, 0, pos), (grp, bh, wh, p, 1, pos))
      }
    }.toDF("__tg", "__tb", "within", "p", "role", "pos")

    // pass 3: rank ONLY inside target cells (one small window per target).
    // Null-safe on the group key: a using-join on g would silently DROP
    // every null-group row, where the window-rank semantics this replaces
    // keep null as its own group.
    withB.join(broadcast(targets),
        col("g") <=> col("__tg") && col("__b") === col("__tb"))
      .drop("__tg", "__tb")
      .withColumn("rnc", row_number().over(
        Window.partitionBy("g", "__b", "p", "role").orderBy("v")))
      .filter(col("rnc") === col("within"))
      .groupBy("g", "p", "pos")
      .agg(max(when(col("role") === 0, col("v"))).as("v_lo"),
        max(when(col("role") === 1, col("v"))).as("v_hi"))
      .select(col("g"), col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) *
          (col("pos") - floor(col("pos")))).as("q"))
  }

  /** Exact per-group MEDIAN over a FREQUENCY table `(g, v, cnt)` — the
    * compressed-domain order statistic for values with a structurally
    * bounded domain (scaled money cents, scaled signal levels): the rank
    * walk runs over distinct values ONLY, so the window sees ≤ |domain|
    * rows per group regardless of data volume. Median = mean of the
    * order statistics at ranks (n+1)//2 and (n+2)//2, computed as
    * `(v_lo + v_hi) / 2.0` on integer-valued doubles — bit-equal to the
    * window-rank formulation it replaces (the midpoint of two exactly
    * representable integers ≤ 2^52 is exactly representable). Returns
    * one row per group: (`g`, `out`).
    *
    * PRECONDITIONS (r15 advice): the input must be a true frequency
    * table — (`g`, `v`) pairs DISTINCT (a duplicated value row
    * double-counts through the cumulative range-frame sum; aggregate
    * `cnt` by (g, v) first if the grain is unclear) — and the caller's
    * frame must not already carry columns named `__cum`/`__n`/`__lo`/
    * `__hi` (working columns added internally; both current callers
    * produce `freq` via groupBy(g, v).count(), which guarantees both).
    */
  def medianFromFreq(f: DataFrame, g: String, v: String, cnt: String,
      out: String): DataFrame = {
    val cum = f
      .withColumn("__cum", sum(col(cnt)).over(
        Window.partitionBy(g).orderBy(v)))
      .withColumn("__n", sum(col(cnt)).over(Window.partitionBy(g)))
      .withColumn("__lo", expr("(__n + 1) div 2"))
      .withColumn("__hi", expr("(__n + 2) div 2"))
    def at(r: String) = max(when(
      col("__cum") - col(cnt) < col(r) && col(r) <= col("__cum"),
      col(v).cast("double")))
    cum.groupBy(g)
      .agg(((at("__lo") + at("__hi")) / 2.0).as(out))
  }

  /** Adds `rn` (1-based rank of `v` within `g`) and `n` (group size) to
    * `df`, bucketing `v` into `buckets` fixed cells over [vLo, vHi).
    * Values outside the range clamp into the edge cells (monotone, so
    * still exact — only balance suffers).
    */
  def valueBucketed(df: DataFrame, g: String, v: String, buckets: Int,
      vLo: Double, vHi: Double): DataFrame = {
    require(buckets > 0 && vHi > vLo)
    val width = (vHi - vLo) / buckets
    val cell = least(
      greatest(floor((col(v).cast("double") - lit(vLo)) / lit(width)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
    val withB = df.withColumn("__b", cell)

    // pass 1: per-(group, cell) counts — map-side combined, |g|·B rows out
    val counts = withB.groupBy(col(g), col("__b"))
      .agg(count(lit(1)).as("__c"))

    // offsets via prefix sums over the TINY counts table (the only
    // per-group-single-reducer window left, and it sees ≤ B rows/group)
    val wOff = Window.partitionBy(g).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("__c")).over(Window.partitionBy(g)))
      .select(col(g), col("__b"), col("__off"), col("n"))

    // pass 2: rank within each cell; every sort bounded by the cell size.
    // Null-safe on g (same rationale as orderStatistics' pass-3 join).
    val offsR = offs.withColumnRenamed(g, "__og").withColumnRenamed("__b", "__ob")
    withB.join(broadcast(offsR),
        col(g) <=> col("__og") && col("__b") === col("__ob"))
      .drop("__og", "__ob")
      .withColumn("rn",
        col("__off") + row_number().over(
          Window.partitionBy(g, "__b").orderBy(v)))
      .drop("__b", "__off")
  }
}
