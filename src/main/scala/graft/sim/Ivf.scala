package graft.sim

import graft.core.Exact
import graft.expressions.GraftExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * for embedding search next to hyperplane LSH (`s2_ann_lsh`).
  *
  * Index = a small k-cell partition of the corpus by nearest centroid;
  * query = probe only the `nprobe` nearest cells. At 100 TB the corpus is
  * written partitioned by `cell`, so a probe reads nprobe/k of the data
  * (partition pruning), and the centroid matrix (k × dim doubles) ships to
  * executors as one broadcast constant inside a codegen expression.
  *
  * Training is fully deterministic: seed centroids are the first k vectors
  * by id, and Lloyd updates use the exact decimal mean
  * ([[graft.core.Exact]]), so centroids — and therefore search results —
  * are bit-identical on any partitioning or rerun.
  */
object Ivf {

  /** L2-normalize a row-major centroid matrix (cosine ranking = dot against
    * normalized centroids).
    */
  private def normalized(cents: Array[Array[Double]]): Array[Double] =
    cents.flatMap { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(_ / n)
    }

  /** Session-scoped index cache modeling the real build-once / search-many
    * lifecycle: an IVF index is built offline and then serves many queries,
    * so train and search must not be conflated in one plan. Training is
    * fully deterministic (see [[train]]), which makes memoization
    * semantically transparent — a cached model is bit-identical to a
    * retrained one.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int), Array[Double]]()

  /** [[train]] memoized on (corpusKey, vecCol, k, iters). Callers pass the
    * corpus identity (e.g. its directory) as `corpusKey`; the query and its
    * verification dumps then share ONE build instead of re-training per
    * consumer.
    */
  def trainCached(embeddings: DataFrame, corpusKey: String, vecCol: String,
      k: Int, iters: Int): Array[Double] =
    modelCache.computeIfAbsent((corpusKey, vecCol, k, iters),
      _ => train(embeddings, vecCol, k, iters))

  /** Deterministic k-cell training: first-k seed + `iters` Lloyd steps.
    * Each step is two shuffles (assign+explode, then groupBy(cell, pos)
    * exact mean); the collected model is k × dim doubles — driver-tiny at
    * any corpus size.
    */
  def train(embeddings: DataFrame, vecCol: String, k: Int, iters: Int): Array[Double] = {
    // fail by name on an empty corpus: first() below would otherwise
    // throw a bare 'next on empty iterator' — and a model over nothing
    // has no honest value to return
    val headRow = embeddings.select(size(col(vecCol))).head(1)
    require(headRow.nonEmpty, "cannot train an IVF model on an empty corpus")
    val dim = headRow(0).getInt(0)
    var cents: Array[Array[Double]] = embeddings
      .orderBy("vec_id").limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    (0 until iters).foreach { _ =>
      val model = normalized(cents)
      val means = embeddings
        .select(GraftExpressions.ivfCell(col(vecCol), model, k).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(Exact.davg(col("v")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    normalized(cents)
  }

  /** Probe search: top-`topK` cosine neighbors per query, scanning only the
    * `nprobe` nearest cells of each query. `queries` must have
    * (query_id, qv); `corpus` (vec_id, `vecCol`).
    */
  def search(corpus: DataFrame, queries: DataFrame, model: Array[Double], k: Int,
      vecCol: String = "embedding", nprobe: Int = 3, topK: Int = 10): DataFrame = {
    val cells = corpus.select(col("vec_id").as("neighbor_id"),
      col(vecCol).as("nv"),
      GraftExpressions.ivfCell(col(vecCol), model, k).as("cell"))
    val probes = broadcast(queries
      .select(col("query_id"), col("qv"),
        explode(GraftExpressions.ivfProbeCells(col("qv"), model, k, nprobe)).as("cell")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.VectorFunctions.cosineFast(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }
}
