package graft.tools

import graft.core.{GraftSession, Tables}
import graft.dedup.Dedup
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

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    time("simhash only")(docs.write.format("noop").mode("overwrite").save())

    val banded = docs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 8).map(b =>
        shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band_id", "band_byte")))
    // bucket skew
    val buckets = banded.groupBy("band_id", "band_byte").count()
      .orderBy(col("count").desc)
    time("bucket histogram")(buckets.limit(10).collect()
      .foreach(r => println(s"SCRATCH bucket ${r.getInt(0)}/${r.getLong(1)}: ${r.getLong(2)}")))

    val a = banded.select(col("band_id"), col("band_byte"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_id"), col("band_byte"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val joined = a.join(b, Seq("band_id", "band_byte"))
      .filter(col("doc_a") < col("doc_b"))
    val deduped = joined.dropDuplicates("doc_a", "doc_b")
    val hits = deduped
      .withColumn("hamming", Dedup.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= 6)
    println("SCRATCH hamming<=6 pairs: " + time("full")(hits.count()))

    // pair-band variant: join on 2 bands at once (complete for hamming<=6:
    // 6 errors touch at most 6 of 8 bands, so >=2 clean shared bands)
    val banded2 = docs.select(col("doc_id"), col("sig"),
      posexplode(array((for { i <- 0 until 8; j <- i + 1 until 8 } yield
        struct(lit(i * 8 + j).as("k"),
          (shiftrightunsigned(col("sig"), i * 8).bitwiseAND(lit(0xFFL)) * 256 +
            shiftrightunsigned(col("sig"), j * 8).bitwiseAND(lit(0xFFL))).as("v"))): _*))
        .as(Seq("pos", "kv")))
      .select(col("doc_id"), col("sig"), col("kv.k").as("bk"), col("kv.v").as("bv"))
    val a2 = banded2.select(col("bk"), col("bv"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b2 = banded2.select(col("bk"), col("bv"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val j2 = a2.join(b2, Seq("bk", "bv")).filter(col("doc_a") < col("doc_b"))
    println("SCRATCH pair-band candidates (with dup): " + time("pairband join")(j2.count()))
    val hits2 = j2.dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", Dedup.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= 6)
    println("SCRATCH pair-band hamming<=6: " + time("pairband full")(hits2.count()))

    spark.stop()
  }
}
