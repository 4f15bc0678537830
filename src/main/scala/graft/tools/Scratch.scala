package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  *
  * Current experiment: do t29/d4 re-execute their shared heavy subtrees
  * (tokenize/shingle) at runtime, or does AQE stage reuse dedupe them?
  * Evidence: the FINAL adaptive plan (Reused* markers) + min-of-5 A/B of
  * the localCheckpoint variants.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-44s min=${ts.min}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def finalPlanSummary(tag: String, df: DataFrame): Unit = {
      df.collect()
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val interesting = s.linesIterator.filter { l =>
        l.contains("Reused") || l.contains("Scan parquet") ||
          l.contains("ShuffleQueryStage") || l.contains("Exchange (")
      }.mkString("\n")
      println(s"=== $tag final plan (reuse/scan/exchange nodes) ===\n$interesting")
    }

    // --- 1) registered queries, final-plan reuse evidence ---
    val qs = graft.SparkEntry.queries
    finalPlanSummary("t29_keywords", qs("t29_keywords")(spark, dir))
    finalPlanSummary("d4_ngram_jaccard", qs("d4_ngram_jaccard")(spark, dir))

    // --- 2) t29 A/B: as registered vs tf localCheckpoint ---
    def t29Variant(ckpt: Boolean): DataFrame = {
      val docs = Tables.loadSpread(spark, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val n = docs.count()
      val tf0 = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val tf = if (ckpt) tf0.localCheckpoint(eager = true) else tf0
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
      tf.join(df, Seq("w"))
        .withColumn("score",
          ((lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) * col("tf").cast("double"))
        .withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("w"), col("tf"), col("df"),
          col("score"))
        .orderBy("doc_id", "rank")
    }
    time("t29 as-registered")(noop(qs("t29_keywords")(spark, dir)))
    time("t29 tf-localCheckpoint")(noop(t29Variant(ckpt = true)))

    // --- 3) d4 A/B: as registered vs sh localCheckpoint ---
    def d4Variant(ckpt: Boolean): DataFrame = {
      import graft.dedup.Dedup
      import graft.expressions.CountMin
      val (threshold, n, cmsWidth, cmsDepth) = (0.5, 2, 1 << 16, 4)
      val docs = Tables.loadSpread(spark, dir, "documents")
      val sh0 = docs
        .select(col("source"), col("doc_id"),
          Dedup.shingleHashes(col("text"), n).as("sh"))
        .filter(size(col("sh")) > 0)
      val sh = if (ckpt) sh0.localCheckpoint(eager = true) else sh0
      val grid = sh.select(explode(col("sh")).as("h"))
        .agg(CountMin.cmsState(col("h"), cmsWidth, cmsDepth).as("sk"))
        .head().getAs[Array[Byte]]("sk")
      val ordered = sh.withColumn("oh",
        CountMin.cmsOrder(col("sh"), grid, cmsWidth, cmsDepth))
      val prefixLen = (size(col("oh")) - ceil(lit(threshold) * size(col("oh"))) + 1)
        .cast("int")
      val prefixes = ordered.select(col("source"), col("doc_id"),
        explode(slice(col("oh"), lit(1), prefixLen)).as("h"))
      val joinKeys = Seq("source", "h")
      val a = prefixes.select((joinKeys.map(col) :+ col("doc_id").as("doc_a")): _*)
      val b = prefixes.select((joinKeys.map(col) :+ col("doc_id").as("doc_b")): _*)
      val cands = a.join(b, joinKeys)
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      cands
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }
    time("d4 as-registered")(noop(qs("d4_ngram_jaccard")(spark, dir)))
    time("d4 sh-localCheckpoint")(noop(d4Variant(ckpt = true)))

    // sanity: the variants return identical rows
    val base29 = qs("t29_keywords")(spark, dir).collect().toSeq
    val var29 = t29Variant(ckpt = true).collect().toSeq
    println(s"t29 identical: ${base29 == var29} (${base29.size} rows)")
    val base4 = qs("d4_ngram_jaccard")(spark, dir).collect().toSeq
    val var4 = d4Variant(ckpt = true).collect().toSeq
    println(s"d4 identical: ${base4 == var4} (${base4.size} rows)")

    spark.stop()
  }
}
