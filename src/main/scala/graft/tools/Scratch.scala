package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  *
  * Current experiment (r16): the verdict's task-3/task-6 targets —
  *  - d9: decompose wall time (the sha256+checkpoint pass vs the
  *    bloom-screened anti-join) and A/B the first-wins-before-screen fold;
  *  - d5: decompose (embed pipeline runs TWICE today — once for the
  *    adaptive-sizing count, once into the persisted working set) and A/B
  *    a single-materialization variant;
  *  - q27: bucket-width sweep (day vs wider/narrower) — result-invisible
  *    by construction (exact inequality filter above the bucket join).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.headOption.getOrElse("all")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Alternating A/B/...: interleaved passes so host drift hits all
      * variants equally; min per variant. */
    def ab(tag: String, passes: Int, variants: (String, () => DataFrame)*): Unit = {
      variants.foreach { case (_, f) => noop(f()) } // warm all
      val times = scala.collection.mutable.Map[String, List[Double]]()
      (1 to passes).foreach { _ =>
        variants.foreach { case (name, f) =>
          val t0 = System.nanoTime(); noop(f())
          val t = (System.nanoTime() - t0) / 1e9
          times(name) = t :: times.getOrElse(name, Nil)
        }
      }
      variants.foreach { case (name, _) =>
        val ts = times(name)
        println(f"[$tag] $name%-28s min=${ts.min}%.3f  (${ts.reverse.map(t => f"$t%.2f").mkString(" ")})")
      }
    }

    // ---------- d9 ----------
    def d9HashedOnly(): DataFrame =
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_key"))
        .localCheckpoint(eager = true)
    def d9Cur(): DataFrame =
      graft.SparkEntry.queries("d9_incremental_dedup")(spark, dir)
    // plain anti-join (no bloom screen) over the same checkpointed slices:
    // at this sf everything broadcasts anyway — isolates the bloom
    // machinery's fixed cost (NOT a candidate shape for 100 TB: a plain
    // left-anti can only build-right, i.e. shuffle/broadcast the LEDGER)
    def d9PlainAnti(): DataFrame = {
      val hashed = d9HashedOnly()
      val ledger = hashed.filter(col("doc_id") < 250)
        .select("content_key").distinct()
      val batch = hashed.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("content_key"))
        .unionAll(hashed.filter(col("doc_id") < 100)
          .select((col("doc_id") + 1000).as("doc_id"), col("content_key")))
        .unionAll(hashed.filter(col("doc_id") >= 250 && col("doc_id") < 300)
          .select((col("doc_id") + 2000).as("doc_id"), col("content_key")))
      batch.groupBy("content_key").agg(min(col("doc_id")).as("doc_id"))
        .join(ledger, Seq("content_key"), "left_anti")
        .select("doc_id", "content_key")
        .orderBy("doc_id")
    }

    // ---------- d5 ----------
    def docVecs() =
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          graft.expressions.GraftExpressions
            .embedShingles(col("text"), 3, 512).as("vec"))
        .filter(array_max(col("vec")) > 0f)
    def d5EmbedOnly(): DataFrame = docVecs()
    def d5Cur(): DataFrame =
      graft.SparkEntry.queries("d5_embedding_neardup")(spark, dir)

    // ---------- q27 ----------
    def q27(bucketMs: Long): DataFrame = {
      val day = 86400000L
      def ms(c: org.apache.spark.sql.Column) = unix_millis(c.cast("timestamp"))
      val iv = Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          ms(col("o_orderdate")).as("ws"),
          (ms(col("o_orderdate")) +
            (lit(1) + col("o_orderkey") % 14) * day).as("we"))
      val pt = Tables.load(spark, dir, "lineitem")
        .select(ms(col("l_shipdate")).as("p"), col("l_quantity"))
      graft.core.RangeJoin.intervalJoin(iv, "ws", "we", pt, "p", bucketMs)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          graft.core.Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderkey")
    }

    val day = 86400000L
    if (which == "all" || which == "d9")
      ab("d9", 5,
        "hashed_ckpt_only" -> (() => d9HashedOnly()),
        "d9_current" -> (() => d9Cur()),
        "d9_plain_anti" -> (() => d9PlainAnti()))
    if (which == "all" || which == "d5")
      ab("d5", 5,
        "embed_pipeline_once" -> (() => d5EmbedOnly()),
        "d5_current" -> (() => d5Cur()))
    if (which == "all" || which == "q27")
      ab("q27", 5,
        "bucket_1d (current)" -> (() => q27(day)),
        "bucket_2d" -> (() => q27(2 * day)),
        "bucket_4d" -> (() => q27(4 * day)),
        "bucket_7d" -> (() => q27(7 * day)),
        "bucket_12h" -> (() => q27(day / 2)))

    spark.stop()
  }
}
