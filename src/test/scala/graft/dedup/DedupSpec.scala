package graft.dedup

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Dedup-operator invariants not covered by the DuckDB oracle. */
class DedupSpec extends SparkSpec {

  test("simhash: identical text -> identical signature; hamming 0") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence altogether now"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 6)
  }

  test("d3 band-pair blocking is complete vs brute force") {
    val lsh = DedupQueries.d3Simhash.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet

    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", Dedup.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= 6)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Number]("hamming").longValue())).toSet

    assert(lsh == brute)
    assert(brute.nonEmpty) // fixture actually exercises the path
  }

  test("jaccardJoin prefix filtering is complete vs brute force") {
    val docs = Tables.load(spark, sf, "documents")
    val t = 0.5
    val prefixed = Dedup.jaccardJoin(docs, "doc_id", "text", t, n = 2,
      blockCol = Some("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sh = docs.select(col("doc_id"), col("source"),
      Dedup.shingleHashes(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(sh.select(col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= t)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    assert(prefixed == brute)
    assert(brute.nonEmpty)
  }
}
