package graft.sim

import graft.SparkSpec
import graft.core.Tables
import graft.expressions.Quant
import org.apache.spark.sql.functions._

class MmrRerankSpec extends SparkSpec {

  test("s11: five distinct picks; rank 1 is pure-relevance argmax with div 0") {
    val rows = SimilarityQueries.s11MmrRerank.fn(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5 && !ids.contains(0L))
    val first = rows.head
    assert(first.getAs[Long]("div") == 0L)
    assert(first.getAs[Long]("mmr") == 2 * first.getAs[Long]("rel"))
    // rank 1 really is the global relevance argmax (ties by id)
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Quant.bytes(col("embedding")).as("qv"))
    val qv = e.filter(col("vec_id") === 0).head.getAs[Array[Byte]]("qv")
    val top = e.filter(col("vec_id") =!= 0)
      .withColumn("rel", Quant.dot(lit(qv), col("qv")))
      .orderBy(col("rel").desc, col("vec_id")).limit(1).head
    assert(first.getAs[Long]("vec_id") == top.getAs[Long]("vec_id"))
    // every later pick pays a diversity penalty computed at selection time
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("mmr") ==
        2 * r.getAs[Long]("rel") - r.getAs[Long]("div"))
    }
  }
}
