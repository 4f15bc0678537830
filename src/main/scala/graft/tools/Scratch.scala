package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.expressions.GraftExpressions
    val dim = 1024
    def vecs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), GraftExpressions.embedShingles(col("text"), 3, dim).as("vec"))
      .filter(array_max(col("vec")) > 0f)

    // warmup
    time("warmup d5")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save())

    time("embed only")(vecs.write.format("noop").mode("overwrite").save())

    val rnd = new scala.util.Random(42L)
    val bands = 32; val bits = 10
    val planes = Array.fill(bands * bits * dim)(rnd.nextGaussian())
    def banded = vecs.select(col("doc_id").as("vec_id"),
      posexplode(GraftExpressions.hyperplaneBuckets(col("vec"), planes, bits, bands))
        .as(Seq("band", "bucket")))
    time("embed+buckets")(banded.write.format("noop").mode("overwrite").save())

    def cands = {
      val a = banded.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("vec_id").as("id_b"))
      a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    val n = time("cands count")(cands.count())
    println(s"SCRATCH candidate pairs: $n")

    time("d5 full")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("d5 full again")(graft.dedup.DedupQueries.d5EmbeddingNearDup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
