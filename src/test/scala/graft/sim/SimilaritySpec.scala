package graft.sim

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Similarity-search invariants beyond the DuckDB oracle: cosine known
  * values, and s2 (LSH-bucketed ANN) consistency against s1 (exact).
  */
class SimilaritySpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("Ivf.train on an empty corpus fails by name, not 'next on empty iterator'") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Ivf.train(empty, "embedding", 4, 1)
    }
    assert(ex.getMessage.contains("empty corpus"))
  }

  test("cosineFast: known values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))
    ).toDF("a", "b")
      .select(VectorFunctions.cosineFast(col("a"), col("b")).as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(c(0) == 0.0 && c(1) == 1.0 && c(3) == -1.0)
    assert(math.abs(c(2) - 1.0) < 1e-12)
  }

  test("s2 LSH results are consistent with exact cosine and ranked") {
    val exact = SimilarityQueries.s1AnnBruteForce.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = SimilarityQueries.s2AnnLsh.fn(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every LSH hit carries the exact cosine of that pair
    val cosOk = lsh.forall { r =>
      exact.get((r.getLong(0), r.getLong(2)))
        .forall(e => e == r.getDouble(3))
    }
    assert(cosOk)
    // per query: ranks contiguous from 1, cos non-increasing
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    // recall sanity: bucketed search finds a nonzero share of true top-10
    val truePairs = exact.keySet
    val hitPairs = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((hitPairs & truePairs).nonEmpty)
  }

  test("s3 IVF: deterministic model, exact cosines, recall over probes") {
    val exact = SimilarityQueries.s1AnnBruteForce.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf1 = SimilarityQueries.s3AnnIvf.fn(spark, sf).collect()
    val ivf2 = SimilarityQueries.s3AnnIvf.fn(spark, sf).collect()
    assert(ivf1.nonEmpty)
    // bit-identical across reruns (deterministic training + search)
    assert(ivf1.map(_.toString).toSeq == ivf2.map(_.toString).toSeq)
    // every IVF hit carries the exact cosine of that pair
    assert(ivf1.forall { r =>
      exact.get((r.getLong(0), r.getLong(2))).forall(_ == r.getDouble(3))
    })
    // probing more cells can only improve recall vs a single cell
    val truePairs = exact.keySet
    val hits = ivf1.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((hits & truePairs).nonEmpty)
  }
}
