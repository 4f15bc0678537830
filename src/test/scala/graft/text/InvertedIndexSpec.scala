package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Pins the t18 inverted-index contract after the round-3 lesson: the
  * LIBRARY shape keeps array-typed postings (what an index consumer
  * wants), while the REGISTERED query serializes them to a comma-joined
  * string so scalar-only result checkers can sort/hash the frame.
  */
class InvertedIndexSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta alpha"),
      (1L, "beta gamma"),
      (150L, "alpha"),
      (250L, "beta  beta")
    ).toDF("doc_id", "text")
  }

  test("library shape: array postings, sorted, one row per (term, block)") {
    val idx = TextQueries.invertedIndexBlocks(docs)
    assert(idx.schema("postings").dataType == ArrayType(LongType, containsNull = false))
    val rows = idx.orderBy("w", "block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("alpha", 0L, Seq(0L), 1L),
      ("alpha", 1L, Seq(150L), 1L),
      ("beta", 0L, Seq(0L, 1L), 2L),
      ("beta", 2L, Seq(250L), 1L),
      ("gamma", 0L, Seq(1L), 1L)
    ))
  }

  test("a term's full posting is the ordered concat of its blocks") {
    val idx = TextQueries.invertedIndexBlocks(docs)
    val full = idx.filter(col("w") === "alpha").orderBy("block")
      .select(explode(col("postings")).as("doc_id")).collect().map(_.getLong(0))
    assert(full.toSeq == Seq(0L, 150L))
  }

  test("registered query emits scalar-only columns (driver-hashable)") {
    val out = TextQueries.t18InvertedIndex.fn(spark, sf)
    assert(out.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[ArrayType]),
      s"array column would defeat the driver's frame hash: ${out.schema}")
    assert(out.schema("postings").dataType == StringType)
    val one = out.filter(col("df_block") > 1).limit(1).collect()
    if (one.nonEmpty) {
      val s = one.head.getAs[String]("postings")
      val ids = s.split(",").map(_.toLong)
      assert(ids.sorted.sameElements(ids), "postings string must be sorted")
    }
  }
}
