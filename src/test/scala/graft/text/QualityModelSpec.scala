package graft.text

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Distributed classifier training: bit-identical weights on any
  * partitioning (the decimal-gradient guarantee), better-than-chance
  * accuracy on the derivable label, and feature-histogram sanity.
  */
class QualityModelSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 32

  private def labeled = {
    val n = TextFunctions.tokenCount(col("text"))
    val stops = TextFunctions.stopwordCount(col("text"),
      Seq("the", "a", "and", "of", "to", "in"))
    val ratio = stops.cast("double") / n
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        QualityModel.features(col("text"), Dim).as("feat"),
        when(ratio > 0.05 && ratio < 0.5, 1L).otherwise(0L).as("y"))
  }

  test("codegen features equal the declarative reference formulation") {
    val bad = Tables.load(spark, sf, "documents")
      .select(QualityModel.features(col("text"), Dim).as("fast"),
        QualityModel.featuresReference(col("text"), Dim).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(bad == 0L)
  }

  test("feature histogram: bucket counts sum to the token count") {
    val bad = Tables.load(spark, sf, "documents")
      .select(
        QualityModel.features(col("text"), Dim).as("feat"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).as("n"))
      .filter(expr("aggregate(feat, 0L, (a, x) -> a + x)") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("training is bit-identical on any partitioning") {
    val w1 = QualityModel.train(labeled.repartition(1), Dim, iters = 3)
    val w7 = QualityModel.train(labeled.repartition(7), Dim, iters = 3)
    w1.zip(w7).zipWithIndex.foreach { case ((a, b), i) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b), s"weight $i: $a vs $b")
    }
  }

  test("learned model beats chance on the derivable label") {
    val w = QualityModel.train(labeled, Dim, iters = 60, lr = 0.5)
    val scored = labeled
      .withColumn("pred", when(QualityModel.score(col("feat"), w) > 0.0, 1L)
        .otherwise(0L))
    val (correct, total, pos) = scored
      .agg(sum(when(col("pred") === col("y"), 1L).otherwise(0L)),
        count(lit(1)), sum(col("y")))
      .as[(Long, Long, Long)].head()
    val acc = correct.toDouble / total
    val base = math.max(pos.toDouble / total, 1.0 - pos.toDouble / total)
    assert(acc >= base && acc > 0.55,
      s"accuracy $acc vs majority baseline $base")
  }
}
