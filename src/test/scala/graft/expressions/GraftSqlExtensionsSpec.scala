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
