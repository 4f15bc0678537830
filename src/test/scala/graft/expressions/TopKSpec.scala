package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-heap top-k: window-equivalence (incl. ties), partition
  * invariance, and the map-side partial aggregation that is its point.
  */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  // deterministic fixture with heavy value ties inside groups
  private def rows = (1L to 2000L).map { i =>
    (s"g${i % 7}", (i % 13).toDouble, i)
  }.toDF("g", "v", "id")

  private def viaHeap(parts: Int) =
    rows.repartition(parts)
      .groupBy("g")
      .agg(TopK.topK(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rank", "t")))
      .select(col("g"), col("rank"), col("t.value"), col("t.id"))
      .as[(String, Int, Double, Long)].collect().toSet

  test("equals the window row_number formulation under the same tie-break") {
    val win = rows.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).cast("int"), col("v"), col("id"))
      .as[(String, Int, Double, Long)].collect().toSet
    assert(viaHeap(3) == win && win.nonEmpty)
  }

  test("result is identical on any partitioning") {
    assert(viaHeap(1) == viaHeap(17))
  }

  test("plans as ObjectHashAggregate with a map-side partial") {
    val plan = rows.groupBy("g")
      .agg(TopK.topK(col("v"), col("id"), 5).as("top"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k"), plan) // combine before the exchange
  }

  test("groups smaller than k return all rows, ranked") {
    val tiny = Seq(("a", 2.0, 1L), ("a", 1.0, 2L)).toDF("g", "v", "id")
    val got = tiny.groupBy("g").agg(TopK.topK(col("v"), col("id"), 10).as("t"))
      .select(explode(col("t.id"))).as[Long].collect().toList
    assert(got == List(1L, 2L))
  }

  // Pins the total-order comparator: the old fromLessThan ordering made NaN
  // compare EQUAL to every element (NaN > x, x > NaN, NaN == x all false),
  // which broke the TreeSet contract and silently dropped rows. NaN is
  // reachable from library code — cosineF of a zero-norm vector is NaN.
  test("NaN values rank greatest (Spark sort order) and drop no rows") {
    val withNaN = Seq(
      ("a", Double.NaN, 10L), ("a", Double.NaN, 11L),
      ("a", 5.0, 1L), ("a", 3.0, 2L)).toDF("g", "v", "id")
    val got = withNaN.groupBy("g").agg(TopK.topK(col("v"), col("id"), 3).as("t"))
      .select(posexplode(col("t")).as(Seq("rank", "e")))
      .select(col("rank"), col("e.id")).as[(Int, Long)].collect().toList.sorted
    // both NaN rows kept (id asc among themselves), then the best real value
    assert(got == List((0, 10L), (1, 11L), (2, 1L)), got.toString)

    // and it still equals the window formulation, which sorts NaN first too
    val win = withNaN.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 3)
      .select((col("rn") - 1).cast("int"), col("id"))
      .as[(Int, Long)].collect().toList.sorted
    assert(got == win)
  }

  test("-0.0 ties 0.0 (SQL double equality), resolved by id") {
    val zeros = Seq(("a", 0.0, 5L), ("a", -0.0, 3L)).toDF("g", "v", "id")
    val got = zeros.groupBy("g").agg(TopK.topK(col("v"), col("id"), 1).as("t"))
      .select(explode(col("t.id"))).as[Long].collect().toList
    assert(got == List(3L)) // lower id wins the tie regardless of zero sign
  }
}
