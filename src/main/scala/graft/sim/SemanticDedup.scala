package graft.sim

import graft.expressions.GraftExpressions
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication, SemDeDup-shape (Abbas et al.
  * 2023): k-means-cluster the corpus embeddings, then compare pairs ONLY
  * within a cluster — near-semantic duplicates land in the same cluster,
  * so the quadratic pair search is bounded to cluster-local blocks
  * instead of the corpus.
  *
  * This is the third dedup regime next to lexical LSH ([[EmbeddingDedup]]
  * — random hyperplane bands, similarity ≈ threshold recall tuning) and
  * exact hashing: clustering gives LARGER, semantically-coherent blocks,
  * the practical choice when the dedup criterion is "same content, maybe
  * paraphrased" rather than "same bytes".
  *
  * Scale shape at 100 TB: the model is k×dim doubles trained once
  * ([[Ivf.train]] — deterministic seed + exact decimal means) and ships
  * as a broadcast constant inside the codegen cell expression; the
  * pairwise stage is an equi-join on the cell id, so the shuffle is one
  * pass of (cell, id, vector) and each reducer does |cell|² work. k is
  * the knob bounding |cell| — production SemDeDup runs k ≈ corpus/50k.
  * The drop rule ("b duplicates a if an EARLIER id in the same cell is
  * within the cosine threshold") is a pure function of the input set —
  * deterministic on any partitioning, and exhaustively checkable by an
  * oracle over the dumped (id, cell, vector) assignment.
  */
object SemanticDedup {

  /** The DROPPED rows: each id for which a lower id in the same cell is
    * cosine-≥-`threshold`, with its smallest such duplicate source
    * (`dup_of`), the number of qualifying earlier near-dups (`n_dups`)
    * and the cell. Integer-only output so the cross-engine compare never
    * rides on last-ulp cosine values (the threshold itself has a wide
    * planted margin in d10's corpus).
    */
  def dropped(vecs: DataFrame, idCol: String, vecCol: String,
      model: Array[Double], k: Int, threshold: Double): DataFrame = {
    val cells = vecs.select(col(idCol), col(vecCol),
      GraftExpressions.ivfCell(col(vecCol), model, k).as("cell"))
    val a = cells.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosineFast(col("va"), col("vb")) >= threshold)
      .groupBy(col("id_b"))
      .agg(min(col("cell")).as("cell"), min(col("id_a")).as("dup_of"),
        count(lit(1)).as("n_dups"))
      .select(col("id_b").as(idCol), col("cell"), col("dup_of"), col("n_dups"))
  }

  /** The KEPT rows (everything not in [[dropped]]) — the corpus a
    * training run would consume. One broadcast-able anti-join when the
    * dropped set is small (the common case).
    */
  def kept(vecs: DataFrame, idCol: String, vecCol: String,
      model: Array[Double], k: Int, threshold: Double): DataFrame =
    vecs.join(dropped(vecs, idCol, vecCol, model, k, threshold)
      .select(col(idCol)), Seq(idCol), "left_anti")
}
