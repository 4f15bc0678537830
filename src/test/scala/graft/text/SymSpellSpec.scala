package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SymSpell blocking behind t22: the ≤2-deletion key join must
  * be a COMPLETE candidate generator for levenshtein ≤ 2, and the
  * registered query must plan an equi-join — never the round-3
  * broadcast-vocab cross join.
  */
class SymSpellSpec extends SparkSpec {

  private def editsOf(w: String, rnd: scala.util.Random, n: Int): String = {
    var s = w
    (1 to n).foreach { _ =>
      val op = rnd.nextInt(3)
      val L = s.length
      op match {
        case 0 if L > 1 => // delete
          val i = rnd.nextInt(L); s = s.substring(0, i) + s.substring(i + 1)
        case 1 => // insert
          val i = rnd.nextInt(L + 1)
          s = s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i)
        case _ => // substitute
          val i = rnd.nextInt(L)
          s = s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i + 1)
      }
    }
    s
  }

  test("delete-neighborhood join is complete for every dist<=2 pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Seq("spark", "catalyst", "shuffle", "partition", "exact",
      "vector", "stream", "join", "ab", "a")
    // every (word, corrupted) pair with 0, 1 or 2 random edits
    val pairs = for {
      w <- words; n <- 0 to 2; rep <- 1 to 8
    } yield (w, editsOf(w, rnd, n))
    val df = pairs.toDF("w", "typo")
    val blocked = df
      .withColumn("kw", TextFunctions.deleteNeighborhood2(col("w")))
      .withColumn("kt", TextFunctions.deleteNeighborhood2(col("typo")))
      .withColumn("dist", levenshtein(col("w"), col("typo")))
      .withColumn("share", arrays_overlap(col("kw"), col("kt")))
    val missed = blocked.filter(col("dist") <= 2 && !col("share")).collect()
    assert(missed.isEmpty,
      s"pairs within dist 2 not sharing a delete key: ${missed.mkString(", ")}")
  }

  test("neighborhood size is |w|^2-bounded and contains the word itself") {
    import spark.implicits._
    val df = Seq("a", "ab", "partition").toDF("w")
      .select(col("w"), TextFunctions.deleteNeighborhood2(col("w")).as("ks"))
    df.collect().foreach { r =>
      val w = r.getString(0); val ks = r.getSeq[String](1)
      val l = w.length
      assert(ks.contains(w))
      assert(ks.size <= 1 + l + l * (l - 1) / 2 + 1)
      assert(ks.distinct.size == ks.size)
    }
  }

  test("t22 plans an equi-join, never a cartesian/nested-loop scan") {
    val plan = TextQueries.t22TypoCorrection.fn(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("blocked t22 equals the brute-force formulation at sf0.001") {
    val got = TextQueries.t22TypoCorrection.fn(spark, sf).collect()
    // independent brute force over the same planted typos
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val typos = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), element_at(split(col("text"), " "), 1).as("orig"))
      .filter(length(col("orig")) > 0)
      .withColumn("pos", (col("doc_id") % length(col("orig"))).cast("int") + 1)
      .withColumn("typo",
        concat(col("orig").substr(lit(1), col("pos") - 1), lit("z"),
          expr("substring(orig, pos + 1)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("dist"), col("w"))
    val want = typos.crossJoin(vocab)
      .withColumn("dist", levenshtein(col("typo"), col("w")))
      .filter(col("dist") <= 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("typo"), col("w").as("corrected"),
        col("dist"), (col("w") === col("orig")).as("recovered"))
      .orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }
}
