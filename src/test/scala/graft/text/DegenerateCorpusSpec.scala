package graft.text

import graft.SparkSpec

/** Pins the round-12 latent-sweep findings on TextQueries-family helpers
  * over DEGENERATE corpora: the empty corpus is a legal input (a filter
  * chain can drop every document), and before the sweep it crashed two
  * public helpers —
  *
  *  - [[BpeTrainer.tokenCount]] reduced an empty dataset
  *    (`UnsupportedOperationException: empty collection`) where the only
  *    honest answer is 0;
  *  - [[QualityModel.train]] NPE'd out of `Row.getDouble` on the null
  *    gradient sums and would have divided by n = 0, poisoning every
  *    weight to NaN.
  */
class DegenerateCorpusSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def emptyDocs = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("BpeTrainer.tokenCount over an empty corpus is 0, not a crash") {
    assert(BpeTrainer.tokenCount(emptyDocs, "text", Seq(("a", "b"))) == 0L)
  }

  test("BpeTrainer.train over an empty corpus learns no merges") {
    assert(BpeTrainer.train(emptyDocs, "text", 5).isEmpty)
  }

  test("BpeTrainer.tokenCount over all-empty documents is 0") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(BpeTrainer.tokenCount(docs, "text", Nil) == 0L)
  }

  test("QualityModel.train over an empty corpus returns the zero model, not NaNs") {
    val labeled = emptyDocs.select(
      QualityModel.features(col("text"), 4).as("feat"), lit(0L).as("y"))
    val w = QualityModel.train(labeled, 4)
    assert(w.length == 5 && w.forall(_ == 0.0))
  }
}
