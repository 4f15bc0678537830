package graft.text

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class VocabGrowthSpec extends SparkSpec {

  test("t30: vocab curve is monotone and closes at the corpus vocabulary") {
    val rows = TextQueries.t30VocabGrowth.fn(spark, sf).collect()
      .sortBy(_.getAs[Long]("block"))
    assert(rows.nonEmpty)
    // monotone non-decreasing cumulative curves, consistent increments
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("vocab") ==
          a.getAs[Long]("vocab") + b.getAs[Long]("new_terms"))
        assert(b.getAs[Long]("tokens_cum") ==
          a.getAs[Long]("tokens_cum") + b.getAs[Long]("toks"))
      case _ =>
    }
    val totalVocab = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    assert(rows.last.getAs[Long]("vocab") == totalVocab)
    assert(rows.head.getAs[Long]("vocab") == rows.head.getAs[Long]("new_terms"))
  }
}
