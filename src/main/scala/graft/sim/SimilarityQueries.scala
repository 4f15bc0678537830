package graft.sim

import graft.QueryDef
import graft.core.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table.
  *
  * s1 is the exact baseline: broadcast the (small) query set against the
  * corpus — one corpus scan, no shuffle of the corpus, per-partition
  * top-k via window. s2 is the scale path: hyperplane-LSH bucketing turns
  * ANN into a bucket-local join (corpus shuffled once by bucket id, query
  * fan-out only to matching buckets).
  */
object SimilarityQueries {

  /** Exact brute-force cosine top-10 for query vectors (vec_id < 10).
    * Bit-exact double cosine on both engines → full oracle compare
    * including similarity values.
    */
  val s1AnnBruteForce: QueryDef = QueryDef(
    "s1_ann_topk",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosineFast(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    },
    Some("""
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                                                  CAST(e.embedding AS DOUBLE[])) DESC,
                                           e.vec_id) AS rank
        FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id != q.vec_id)
      WHERE rank <= 10 ORDER BY query_id, rank""")
  )

  /** LSH-bucketed ANN: 8-bit hyperplane signature partitions the corpus;
    * each query searches only its own bucket. Approximate (recall is
    * spec-tested against s1) — rows-only driver check, no SQL oracle.
    */
  val s2AnnLsh: QueryDef = QueryDef(
    "s2_ann_lsh",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val bucketed = e.select(
        col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), nBits = 8, dim = 64).as("bucket"))
      val q = broadcast(
        bucketed.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("bucket").as("qbucket")))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      bucketed
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("bucket"))
        .join(q, col("bucket") === col("qbucket") && col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosineFast(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    },
    None
  )

  /** IVF-probe ANN: deterministic k=16-cell index, 3-probe search. The
    * other scale path next to s2's hyperplane LSH — at 100 TB the corpus
    * is partitioned by cell and each probe prunes to nprobe/k of the data.
    * Approximate (recall spec-tested vs s1) — rows-only driver check.
    */
  val s3AnnIvf: QueryDef = QueryDef(
    "s3_ann_ivf",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val model = Ivf.train(e, "embedding", k = 16, iters = 2)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.search(e, queries, model, k = 16, nprobe = 3, topK = 10)
    },
    None
  )

  val all: Seq[QueryDef] = Seq(s1AnnBruteForce, s2AnnLsh, s3AnnIvf)
}
