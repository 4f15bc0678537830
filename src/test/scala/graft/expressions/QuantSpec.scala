package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** int8 quantization kernels: bytes/ints bit-equality, dot-product
  * exactness, reconstruction error bound, recall vs exact cosine, and
  * the codegen pin.
  */
class QuantSpec extends SparkSpec {

  import spark.implicits._

  private def emb = graft.core.Tables.load(spark, sf, "embeddings")

  test("quant_ints values equal the packed quant_bytes, scales positive") {
    val rows = emb.select(Quant.bytes(col("embedding")).as("b"),
      Quant.ints(col("embedding")).as("q"),
      Quant.scale(col("embedding")).as("s"))
      .collect()
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]]("b")
      val q = r.getSeq[Int](1)
      assert(b.length == q.length)
      b.zip(q).foreach { case (bb, qq) => assert(bb.toInt == qq) }
      assert(r.getDouble(2) > 0.0)
      assert(q.forall(x => x >= -127 && x <= 127))
    }
  }

  test("dequantized vectors reconstruct within scale/2 per component") {
    val rows = emb.select(col("embedding"), Quant.ints(col("embedding")).as("q"),
      Quant.scale(col("embedding")).as("s")).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](0)
      val q = r.getSeq[Int](1)
      val s = r.getDouble(2)
      x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(qi * s - xi) <= s / 2 + 1e-12,
          s"component $xi -> $qi at scale $s")
      }
    }
  }

  test("int8_dot equals the exact integer dot product") {
    val a = Array[Byte](1, -2, 3, 127, -127)
    val b = Array[Byte](5, 4, -3, 1, 1)
    assert(Quant.int8Dot(a, b) == (5 - 8 - 9 + 127 - 127).toLong)
  }

  test("quantized top-10 keeps high recall vs exact cosine (s1)") {
    val exact = graft.SparkEntry.queries("s1_ann_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = graft.SparkEntry.queries("s5_ann_quantized")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet == quant.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect quant(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8: $recalls")
  }

  test("hard negatives exclude the planted near-duplicate of query 0") {
    val rows = graft.SparkEntry.queries("s6_hard_negatives")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val q0 = rows.filter(_._1 == 0L).map(_._2).toSet
    assert(q0.nonEmpty, "query 0 returned no negatives")
    // vec 0's planted copy (id 1000000) is the most similar vector in the
    // corpus — the dedup cut must have removed it from the negatives
    assert(!q0.contains(1000000L), s"near-dup leaked into negatives: $q0")
  }

  test("the quantized scorer stays inside whole-stage codegen") {
    val plan = emb
      .select(Quant.bytes(col("embedding")).as("q"), Quant.scale(col("embedding")).as("s"))
      .withColumn("d", Quant.dot(col("q"), col("q")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
