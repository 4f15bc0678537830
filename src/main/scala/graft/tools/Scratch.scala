package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  *
  * Current experiment (r15 batch 3): for d6/d7/t13/t26/t30, which shape
  * wins at sf0.1 — the as-was double/triple derivation, a raw
  * localCheckpoint of the exploded frame, or a (doc, key)-grain
  * pre-aggregate + checkpoint? First profile said the pre-agg variants
  * are flat-to-worse (the (doc,h) grain has ~no combining, so the
  * pre-agg ADDS a corpus-sized exchange; the checkpoint barrier
  * serializes stages that used to overlap). Alternating min-of-5 A/B to
  * decide per query.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Alternating A/B/...: interleaved passes so host drift hits all
      * variants equally; min per variant. */
    def ab(tag: String, variants: (String, () => DataFrame)*): Unit = {
      variants.foreach { case (_, f) => noop(f()) } // warm all
      val times = scala.collection.mutable.Map[String, List[Double]]()
      (1 to 7).foreach { _ =>
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

    val docs = Tables.loadSpread(spark, dir, "documents")

    // ---------- d6 ----------
    def d6Orig(): DataFrame = {
      val kg = docs.select(col("doc_id"),
        posexplode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
          .as(Seq("pos", "h")))
      val dupHashes = kg.groupBy("h").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1).select(col("h"), lit(1).as("dup"))
      kg.join(dupHashes, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"), count(col("dup")).as("n_dup"))
        .withColumn("dup_ratio",
          col("n_dup").cast("double") / col("n_kgrams").cast("double"))
        .orderBy("doc_id")
    }
    def d6Raw(): DataFrame = {
      val kg = docs.select(col("doc_id"),
        explode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
          .as("h")).localCheckpoint()
      val dupHashes = kg.groupBy("h").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1).select(col("h"), lit(1).as("dup"))
      kg.join(dupHashes, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"), count(col("dup")).as("n_dup"))
        .withColumn("dup_ratio",
          col("n_dup").cast("double") / col("n_kgrams").cast("double"))
        .orderBy("doc_id")
    }
    def d6PreAgg(): DataFrame =
      graft.SparkEntry.queries("d6_dup_spans")(spark, dir)

    // ---------- d7 ----------
    def d7Orig(): DataFrame = {
      val kg = docs.select(col("doc_id"),
        posexplode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
          .as(Seq("pos", "h")))
      val bench = kg.filter(col("doc_id") % 20 === 0).select(col("h")).distinct()
      val train = kg.filter(col("doc_id") % 20 =!= 0)
      val hits = train.join(bench, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      train.groupBy("doc_id").agg(count(lit(1)).as("n_kgrams"))
        .join(hits, Seq("doc_id"), "left")
        .withColumn("n_contaminated", coalesce(col("n_hit"), lit(0L)))
        .withColumn("contamination",
          col("n_contaminated").cast("double") / col("n_kgrams").cast("double"))
        .select("doc_id", "n_kgrams", "n_contaminated", "contamination")
        .orderBy("doc_id")
    }
    def d7RawFold(): DataFrame = {
      val kg = docs.select(col("doc_id"),
        explode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
          .as("h")).localCheckpoint()
      val bench = kg.filter(col("doc_id") % 20 === 0)
        .select(col("h")).distinct().withColumn("mark", lit(1))
      kg.filter(col("doc_id") % 20 =!= 0)
        .join(bench, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"), count(col("mark")).as("n_contaminated"))
        .withColumn("contamination",
          col("n_contaminated").cast("double") / col("n_kgrams").cast("double"))
        .select("doc_id", "n_kgrams", "n_contaminated", "contamination")
        .orderBy("doc_id")
    }
    def d7FoldNoCkpt(): DataFrame = {
      val kg = docs.select(col("doc_id"),
        explode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
          .as("h"))
      val bench = kg.filter(col("doc_id") % 20 === 0)
        .select(col("h")).distinct().withColumn("mark", lit(1))
      kg.filter(col("doc_id") % 20 =!= 0)
        .join(bench, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"), count(col("mark")).as("n_contaminated"))
        .withColumn("contamination",
          col("n_contaminated").cast("double") / col("n_kgrams").cast("double"))
        .select("doc_id", "n_kgrams", "n_contaminated", "contamination")
        .orderBy("doc_id")
    }
    def d7PreAgg(): DataFrame =
      graft.SparkEntry.queries("d7_contamination")(spark, dir)

    // ---------- t13 ----------
    def t13Orig(): DataFrame = {
      import org.apache.spark.sql.types.DoubleType
      val bg = docs.select(col("doc_id"),
        graft.expressions.GraftExpressions.wordBigrams(col("text"))
          .as(Seq("w1", "w2")))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .agg(countDistinct(col("w")).as("v"))
      bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("c2")).as("sum_c2"),
          sum(col("c1")).as("sum_c1"),
          first(col("v")).as("v"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_c2"),
          ((col("sum_c2") + col("n_bigrams")).cast(DoubleType) /
            (col("sum_c1") + col("n_bigrams") * col("v")).cast(DoubleType))
            .as("familiarity"))
        .orderBy("doc_id")
    }
    def t13PreAgg(): DataFrame =
      graft.SparkEntry.queries("t13_lm_familiarity")(spark, dir)

    // ---------- t26 ----------
    def t26Variant(ckpt: Boolean): DataFrame = {
      val footer = "all rights reserved contact the site admin for reuse terms"
      val blocks0 = docs
        .withColumn("t2",
          when(col("doc_id") % 5 === 0, concat(lit(footer + " "), col("text")))
            .otherwise(col("text")))
        .select(col("doc_id"),
          expr("filter(split(t2, ' '), w -> length(w) > 0)").as("ws"))
        .select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, cast(ceil(size(ws) / 10.0) as int) - 1),
                         i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"""))
            .as(Seq("block_idx", "block")))
        .withColumn("h", sha2(col("block"), 256))
      val blocks = if (ckpt) blocks0.localCheckpoint() else blocks0
      val winners = blocks.groupBy("h")
        .agg(min(struct(col("doc_id"), col("block_idx"))).as("w"))
      blocks.join(winners, Seq("h"))
        .withColumn("kept",
          col("doc_id") === col("w.doc_id") && col("block_idx") === col("w.block_idx"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("kept").cast("long")).as("n_kept"),
          sha2(expr(
            """array_join(transform(
                 array_sort(collect_list(case when kept then struct(block_idx, block) end)),
                 x -> x.block), ' ')"""), 256).as("clean_sha"))
        .orderBy("doc_id")
    }

    // ---------- t30 ----------
    def t30Orig(): DataFrame = {
      val tokens = docs
        .select(expr("doc_id div 64").as("block"),
          explode(split(col("text"), " ")).as("word"))
      val newTerms = tokens.groupBy("word")
        .agg(min(col("block")).as("block"))
        .groupBy("block").agg(count(lit(1)).as("new_terms"))
      val tokCounts = tokens.groupBy("block")
        .agg(count(lit(1)).as("toks"))
      val nDocs = docs.select(expr("doc_id div 64").as("block"))
        .groupBy("block").agg(count(lit(1)).as("n_docs"))
      val per = nDocs.join(tokCounts, Seq("block"))
        .join(newTerms, Seq("block"), "left")
        .na.fill(0L, Seq("new_terms"))
      val rhs = per.select(col("block").as("b2"),
        col("new_terms").as("nt2"), col("toks").as("tk2"))
      per.join(broadcast(rhs), col("b2") <= col("block"))
        .groupBy("block", "n_docs", "toks", "new_terms")
        .agg(sum(col("nt2")).as("vocab"), sum(col("tk2")).as("tokens_cum"))
        .orderBy("block")
    }
    def t30PerCkptOnly(): DataFrame = {
      val tokens = docs
        .select(expr("doc_id div 64").as("block"),
          explode(split(col("text"), " ")).as("word"))
      val newTerms = tokens.groupBy("word")
        .agg(min(col("block")).as("block"))
        .groupBy("block").agg(count(lit(1)).as("new_terms"))
      val tokCounts = tokens.groupBy("block")
        .agg(count(lit(1)).as("toks"))
      val nDocs = docs.select(expr("doc_id div 64").as("block"))
        .groupBy("block").agg(count(lit(1)).as("n_docs"))
      val per = nDocs.join(tokCounts, Seq("block"))
        .join(newTerms, Seq("block"), "left")
        .na.fill(0L, Seq("new_terms"))
        .localCheckpoint()
      val rhs = per.select(col("block").as("b2"),
        col("new_terms").as("nt2"), col("toks").as("tk2"))
      per.join(broadcast(rhs), col("b2") <= col("block"))
        .groupBy("block", "n_docs", "toks", "new_terms")
        .agg(sum(col("nt2")).as("vocab"), sum(col("tk2")).as("tokens_cum"))
        .orderBy("block")
    }
    def t30Registered(): DataFrame =
      graft.SparkEntry.queries("t30_vocab_growth")(spark, dir)

    // t21 original (regexp tokenCount in the doc-stats scan, separate
    // vocab pass) vs registered (token mass rides the explode pass)
    def t21Orig(): DataFrame = {
      import org.apache.spark.sql.types.DoubleType
      import graft.text.TextFunctions.tokenCount
      val docStats = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(sha2(col("text"), 256)).as("n_distinct"),
        sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      val vocab = docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source").agg(countDistinct(col("w")).as("n_vocab"))
      val lang = docs.groupBy("source", "lang").agg(count(lit(1)).as("nl"))
        .groupBy("source")
        .agg(max(struct(col("nl"), col("lang"))).as("m"))
        .select(col("source"), col("m.lang").as("majority_lang"))
      docStats.join(vocab, Seq("source")).join(lang, Seq("source"))
        .withColumn("dup_rate",
          lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_docs").cast(DoubleType))
        .withColumn("mean_chars",
          col("n_chars").cast(DoubleType) / col("n_docs").cast(DoubleType))
        .select("source", "n_docs", "n_tokens", "n_vocab", "majority_lang",
          "dup_rate", "mean_chars")
        .orderBy("source")
    }
    // c5: parent.distinct() before each anti-join vs raw PK column
    def c5Variant(distinctParents: Boolean): DataFrame = {
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame = {
        val pkeys0 = parent.select(col(pk))
        val pkeys = if (distinctParents) pkeys0.distinct() else pkeys0
        val orphans = child.join(pkeys, col(ck) === col(pk), "left_anti")
        child.agg(count(lit(1)).as("n_children"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk_edge"), col("n_children"),
            col("n_orphans"))
      }
      val customer = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders")
      val nation = Tables.load(spark, dir, "nation")
      Seq(
        edge("customer.nation", customer, "c_nationkey", nation, "n_nationkey"),
        edge("lineitem.order", Tables.load(spark, dir, "lineitem"), "l_orderkey",
          orders, "o_orderkey"),
        edge("nation.region", nation, "n_regionkey",
          Tables.load(spark, dir, "region"), "r_regionkey"),
        edge("orders.customer", orders, "o_custkey", customer, "c_custkey"),
        edge("orders.even_customer", orders, "o_custkey",
          customer.filter(col("c_custkey") % 2 === 0), "c_custkey"),
        edge("supplier.nation", Tables.load(spark, dir, "supplier"),
          "s_nationkey", nation, "n_nationkey"))
        .reduce(_.unionAll(_))
        .orderBy("fk_edge")
    }
    ab("c5", "distinct-parents" -> (() => c5Variant(true)),
      "raw-pk" -> (() => c5Variant(false)))
    // result identity
    val a5 = c5Variant(true).collect().toSeq
    val b5 = c5Variant(false).collect().toSeq
    println(s"c5 identical: ${a5 == b5} (${a5.size} rows)")
    spark.stop()
  }
}
