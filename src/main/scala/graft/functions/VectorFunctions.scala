package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (no UDFs, no driver-side loops).
  *
  * All folds are sequential per row, so results are bit-deterministic and
  * independent of partitioning — required both for the oracle compare and
  * for reproducible reruns on a cluster.
  */
object VectorFunctions {

  /** Elementwise double view of a float vector (promote BEFORE multiply so
    * products are computed in double, matching any double-precision oracle).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, dot / (|a|·|b|) — higher-order-function form
    * (portable, but evaluates per element through the interpreter).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity as a native codegen expression over float vectors —
    * identical arithmetic (sequential double fold) to [[cosine]], one JVM
    * call per row. This is the hot-path form for pair joins.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.expressions.GraftExpressions.cosineF(a, b)

  def l1(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, x) => acc + abs(x))

  /** Signed random-hyperplane LSH signature (SimHash for vectors): `nBits`
    * pseudo-random hyperplanes derived from a fixed seed; bucket id packs
    * the sign bits. Vectors in the same bucket are cosine-near with high
    * probability — the scale path for ANN (bucket-local search instead of
    * a full cross join).
    */
  def hyperplaneBucket(v: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    graft.expressions.GraftExpressions.hyperplaneBucket(v, planes.flatten, nBits)
  }
}
