package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The token-count fusion rule: fires on exactly the library idiom,
  * leaves near-miss shapes alone, and is bit-equal to the unfused
  * evaluation on real corpus text and adversarial strings.
  */
class FuseTokenCountSpec extends SparkSpec {

  import spark.implicits._

  private val idiom = size(filter(split(col("text"), " "), w => length(w) > 0))

  test("kernel: known counts incl. empty, all-space and multi-space") {
    val rows = Seq("", " ", "  ", "a", " a", "a ", "a b", "a  b ", " a  b  c ")
      .toDF("text")
      .select(col("text"), idiom.as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows == Map("" -> 0, " " -> 0, "  " -> 0, "a" -> 1, " a" -> 1,
      "a " -> 1, "a b" -> 2, "a  b " -> 2, " a  b  c " -> 3))
  }

  test("rule fires on the idiom (plan shows the fused kernel)") {
    val plan = graft.core.Tables.load(spark, sf, "documents")
      .select(idiom.as("n"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("nonempty_token_count"), plan)
  }

  test("rule leaves near-miss shapes alone") {
    def planOf(c: org.apache.spark.sql.Column): String =
      graft.core.Tables.load(spark, sf, "documents").select(c.as("n"))
        .queryExecution.optimizedPlan.toString
    // different separator, different predicate: both must stay unfused
    assert(!planOf(size(filter(split(col("text"), ","), w => length(w) > 0)))
      .contains("nonempty_token_count"))
    assert(!planOf(size(filter(split(col("text"), " "), w => length(w) > 1)))
      .contains("nonempty_token_count"))
  }

  test("fused result is bit-equal to an unfused formulation on the corpus") {
    // length(w) >= 1 is semantically identical but not matched by the rule
    val unfused = size(filter(split(col("text"), " "), w => length(w) >= 1))
    val mismatches = graft.core.Tables.load(spark, sf, "documents")
      .select(idiom.as("fused"), unfused.as("plain"))
      .filter(col("fused") =!= col("plain")).count()
    assert(mismatches == 0L)
  }

  test("fuzz: fused kernel equals unfused on adversarial strings") {
    val rnd = new scala.util.Random(42)
    val pieces = Seq("", " ", "  ", "a", "word", "π", "☃", "\t", "x y")
    val cases = (1 to 200).map(_ =>
      (1 to rnd.nextInt(8)).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(rnd.nextInt(3) match { case 0 => ""; case 1 => " "; case _ => "  " }))
    val unfused = size(filter(split(col("text"), " "), w => length(w) >= 1))
    val bad = cases.toDF("text")
      .select(idiom.as("fused"), unfused.as("plain"), col("text"))
      .filter(col("fused") =!= col("plain"))
      .collect()
    assert(bad.isEmpty, bad.map(_.getString(2)).toSeq.toString)
  }

  test("null text propagates null") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(idiom.as("n")).head()
    assert(r.isNullAt(0))
  }
}
