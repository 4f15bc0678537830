package graft.sim

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Planted near-duplicate recovery: LSH-banded pair generation must find
  * every planted near-copy (θ → 0 ⇒ recall ≈ 1) and return only exact-
  * cosine-verified pairs — checked against brute force on the fixture.
  */
class EmbeddingDedupSpec extends SparkSpec {

  private val dim = 32
  private lazy val vectors: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 20L).map(i =>
      i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    // plant 5 near-copies of vectors 0-4 (tiny perturbation -> cos ~ 1)
    val copies = (0 until 5).map { i =>
      val src = base(i)._2
      (100L + i) -> src.map(x => x + 0.001f * rnd.nextGaussian().toFloat)
    }
    base ++ copies
  }

  test("finds planted near-dups, values exact, subset of brute force") {
    val session = spark
    import session.implicits._
    val df = vectors.toDF("vec_id", "embedding")

    val lsh = EmbeddingDedup.nearDupPairs(df, "vec_id", "embedding", dim,
      threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // all 5 planted pairs recovered
    val pairs = lsh.map(t => (t._1, t._2)).toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i))))

    // brute-force reference: same pairs, same cosines
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosineFast(col("va"), col("vb")))
      .filter(col("cos") >= 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    assert(lsh.toSet == brute) // recall 1.0 on near-identical pairs here
    assert(brute.size == 5)
  }
}
