package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-registered graft functions must match the Column API bit-for-bit. */
class GraftSqlExtensionsSpec extends SparkSpec {

  test("SQL functions match Column API results") {
    val session = spark
    import session.implicits._
    Seq((1L, "the quick brown fox jumps"), (2L, "a different doc"))
      .toDF("id", "text").createOrReplaceTempView("sql_docs")

    val viaSql = spark.sql(
      """SELECT id, simhash64(text) AS sh, rolling_hash(text) AS rh,
        |       minhash_sig(shingle_hashes(text, 2), 8) AS mh
        |FROM sql_docs ORDER BY id""".stripMargin).collect()

    val viaCols = spark.table("sql_docs")
      .select(col("id"), GraftExpressions.simhash64(col("text")).as("sh"),
        GraftExpressions.rollingHash(col("text")).as("rh"),
        GraftExpressions.minhashSig(
          GraftExpressions.shingleHashes(col("text"), 2), 8).as("mh"))
      .orderBy("id").collect()

    assert(viaSql.map(_.toString).toSeq == viaCols.map(_.toString).toSeq)
  }

  test("kgram_hashes and embed_shingles from SQL match Column API") {
    val session = spark
    import session.implicits._
    Seq((1L, "one two three four two three")).toDF("id", "text")
      .createOrReplaceTempView("sql_docs2")
    val viaSql = spark.sql(
      """SELECT kgram_hashes(text, 2) AS kg, embed_shingles(text, 3, 64) AS v
        |FROM sql_docs2""".stripMargin).collect()(0)
    val viaCols = spark.table("sql_docs2")
      .select(GraftExpressions.kgramHashes(col("text"), 2).as("kg"),
        GraftExpressions.embedShingles(col("text"), 3, 64).as("v"))
      .collect()(0)
    assert(viaSql.toString == viaCols.toString)
    // positional: 5 bigrams, order preserved (dup "two three" kept)
    assert(viaSql.getSeq[Long](0).size == 5)
    val kg = viaSql.getSeq[Long](0)
    assert(kg(1) == kg(4)) // "two three" at positions 1 and 4
  }

  test("jaccard_sorted and cosine_f from SQL") {
    val j = spark.sql(
      "SELECT jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").collect()(0)
    assert(j.getDouble(0) == 0.5)
    val c = spark.sql(
      "SELECT cosine_f(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()(0)
    assert(c.getDouble(0) == 1.0)
  }
}
