package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Model-BASED quality filtering — the fastText-shaped classifier every
  * production corpus pipeline eventually trains to replace hand-tuned
  * heuristic gates: hashed bag-of-token features, logistic regression,
  * full-batch gradient descent ON THE CLUSTER.
  *
  * Determinism is engineered in, because a filter that changes with
  * partitioning re-labels the corpus between runs:
  *   - features are INTEGER token-bucket counts (xxhash64 mod dim — no
  *     vocabulary file to drift);
  *   - each gradient component is a SUM of per-row doubles, which is
  *     order-dependent — so the sums take a scale-12 decimal detour
  *     (addition associative ⇒ bit-identical weights on any partitioning,
  *     spec-pinned);
  *   - iterations are fixed-count full-batch steps: one aggregate job per
  *     step, the weight vector (dim+1 doubles) broadcast back in the
  *     scoring expression. At 100 TB each step is one map-side-combinable
  *     pass; nothing but the gradient vector crosses the exchange.
  *
  * Scoring is a sequential-fold dot product (same IEEE shape DuckDB's
  * LIST_DOT_PRODUCT evaluates), which is what lets t23 verify the scored
  * corpus exactly against the dumped weights + features.
  */
object QualityModel {

  private val GradDec = DecimalType(38, 12)

  /** Integer hashed-count feature vector (length `dim`) + implicit bias —
    * one codegen pass over the tokens
    * ([[graft.expressions.TokenBucketsExpr]]; the declarative
    * sequence×filter form scans the token list `dim` times through the
    * lambda interpreter and is kept only as the spec's reference).
    */
  def features(text: Column, dim: Int): Column =
    graft.expressions.TokenBuckets.tokenBuckets(text, dim)

  /** The declarative reference formulation (spec-pinned bit-equal). */
  def featuresReference(text: Column, dim: Int): Column = {
    val toks = filter(split(text, " "), w => length(w) > 0)
    val buckets = transform(toks, w => pmod(xxhash64(w), lit(dim)).cast("int"))
    transform(sequence(lit(0), lit(dim - 1)),
      d => size(filter(buckets, b => b === d)).cast("long"))
  }

  /** Sequential-fold dot of a double weight array (literal) against the
    * integer feature array + bias at the end — index order, one binary
    * add per element, matching LIST_DOT_PRODUCT's evaluation.
    */
  def score(feat: Column, weights: Array[Double]): Column = {
    val dim = weights.length - 1
    val wCol = array(weights.take(dim).map(lit(_)): _*)
    aggregate(zip_with(feat, wCol, (x, w) => x.cast(DoubleType) * w),
      lit(0.0), (acc, v) => acc + v) + lit(weights.last)
  }

  /** Fixed-count full-batch logistic GD. `labeled` needs (feat, y) with
    * y ∈ {0, 1}. Returns dim weights + bias.
    */
  def train(labeled: DataFrame, dim: Int, iters: Int = 5,
      lr: Double = 0.05): Array[Double] = {
    var w = new Array[Double](dim + 1)
    val n = labeled.count().toDouble
    // no rows → no gradient: return the zero model rather than letting
    // the null aggregate sums NPE out of Row.getDouble and the /0 poison
    // every weight to NaN
    if (n == 0) return w
    (1 to iters).foreach { _ =>
      val margin = score(col("feat"), w)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val err = p - col("y").cast(DoubleType)
      val gradCols = (0 until dim).map(d =>
        sum((err * element_at(col("feat"), d + 1).cast(DoubleType))
          .cast(GradDec)).cast(DoubleType).as(s"g$d")) :+
        sum(err.cast(GradDec)).cast(DoubleType).as("gb")
      val row = labeled.agg(gradCols.head, gradCols.tail: _*).head()
      val next = w.clone()
      (0 until dim).foreach(d => next(d) = w(d) - lr * row.getDouble(d) / n)
      next(dim) = w(dim) - lr * row.getDouble(dim) / n
      w = next
    }
    w
  }
}
