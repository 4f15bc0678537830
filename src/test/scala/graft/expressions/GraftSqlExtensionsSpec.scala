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

  test("word_bigrams generator: semantics, SQL lateral view, zip_with equality") {
    val session = spark
    import session.implicits._
    val docs = Seq((1L, "a b  c d"), (2L, "solo"), (3L, ""), (4L, "x y"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("sql_docs3")

    // adjacency semantics: double space breaks the (b, c) pair — empty
    // words never pair, and non-adjacent words never bridge
    val viaCol = docs
      .select(col("id"), GraftExpressions.wordBigrams(col("text")).as(Seq("w1", "w2")))
      .orderBy("id", "w1").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(viaCol.toSeq == Seq((1L, "a", "b"), (1L, "c", "d"), (4L, "x", "y")))

    // SQL generator placement: both projection and LATERAL VIEW forms
    val viaSql = spark.sql(
      """SELECT id, b.w1, b.w2 FROM sql_docs3
        |LATERAL VIEW word_bigrams(text) b AS w1, w2
        |ORDER BY id, w1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(viaSql.toSeq == viaCol.toSeq)

    // exact equality with the built-in zip_with formulation on busy text
    val busy = Seq.tabulate(50)(i => s"w$i t${i % 7} " * 3).toDF("text")
    val gen = busy.select(GraftExpressions.wordBigrams(col("text")).as(Seq("w1", "w2")))
      .groupBy("w1", "w2").count().orderBy("w1", "w2").collect().map(_.toSeq)
    val hof = busy.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .filter(length(col("p.w1")) > 0 && length(col("p.w2")) > 0)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2")).count()
      .orderBy("w1", "w2").collect().map(_.toSeq)
    assert(gen.toSeq == hof.toSeq)
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

  test("round-3 functions from SQL: zorder, kmv algebra, top_k, bloom_state") {
    assert(spark.sql("SELECT zorder(3L, 1L) AS z").collect()(0).getLong(0) == 7L)

    // sketch algebra end to end in pure SQL
    val r = spark.sql(
      """WITH h AS (SELECT xxhash64(CAST(x AS STRING)) AS h,
        |                  CASE WHEN x % 2 = 0 THEN 'a' ELSE 'b' END AS g
        |           FROM range(1, 2001) AS t(x)),
        |  sk AS (SELECT g, kmv_state(h, 64) AS s FROM h GROUP BY g)
        |SELECT kmv_intersect(a.s, b.s, 64) AS inter,
        |       kmv_difference(a.s, b.s, 64) AS diff
        |FROM sk a JOIN sk b ON a.g = 'a' AND b.g = 'b'""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.0) // disjoint sets
    assert(r.getDouble(1) > 0.0)

    val top = spark.sql(
      """SELECT g, top_k(v, id, 2) AS t FROM VALUES
        |  ('a', 3.0, 1L), ('a', 5.0, 2L), ('a', 4.0, 3L) AS r(g, v, id)
        |GROUP BY g""".stripMargin).collect()(0)
    val kept = top.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
    assert(kept == Seq(2L, 3L))

    val bloom = spark.sql(
      "SELECT bloom_state(xxhash64(CAST(x AS STRING)), 4096, 5) AS b " +
        "FROM range(1, 100) AS t(x)").collect()(0).getAs[Array[Byte]](0)
    assert(bloom.length == 512)
    // probe agrees with the Column API builder on the same keys
    assert((1L until 100L).forall { i =>
      val h = spark.sql(s"SELECT xxhash64(CAST($i AS STRING))").collect()(0).getLong(0)
      val longs = new Array[Long](64)
      java.nio.ByteBuffer.wrap(bloom).asLongBuffer().get(longs)
      HashOps.bloomContains(h, longs, 5)
    })
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
