package graft.sim

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pairs at scale: banded random-
  * hyperplane LSH generates candidates (vectors agreeing on all `bits`
  * sign-bits of at least one band meet in a bucket), exact cosine verifies.
  * Complements `d5_embedding_neardup` (the exact brute pair join, feasible
  * only at small n) the way MinHash-LSH complements the brute Jaccard
  * join: candidate generation is a bucket equi-join, never O(n²).
  *
  * Recall is 1 − (1 − p^bits)^bands with p = 1 − θ/π; for true near-dups
  * (θ → 0) this is ≈ 1 with the defaults. The cosine filter runs BEFORE
  * pair dedup, so the dedup shuffle carries only qualifying pairs.
  */
object EmbeddingDedup {

  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bands: Int = 4, bits: Int = 12): DataFrame = {
    val bucketCols = array((0 until bands).map(b =>
      VectorFunctions.hyperplaneBucket(col(vecCol), bits, dim, seed = 42L + b)): _*)
    val banded = embeddings
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"),
        posexplode(bucketCols).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("vec_id").as("id_a"), col("v").as("va"))
    val b = banded.select(col("band"), col("bucket"),
      col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosineFast(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "cos")
  }
}
