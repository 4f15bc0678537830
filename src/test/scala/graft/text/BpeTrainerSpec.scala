package graft.text

import graft.SparkSpec

/** BPE training: the textbook merge sequence on a toy corpus, encoding
  * with learned merges, determinism, and the corpus token-count estimator.
  */
class BpeTrainerSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("learns the textbook merges and encodes accordingly") {
    // classic corpus: 'es'/'est' dominate the pair counts
    val docs = Seq(
      "lowest lowest lowest lowest lowest lowest",
      "newest newest newest newest newest newest",
      "widest widest widest",
      "low low low low low low low").toDF("text")

    val merges = BpeTrainer.train(docs, "text", numMerges = 3)
    // 'e'+'s' (15) first, then 'es'+'t' (15), then 'l'+'o' (13)
    assert(merges(0) == (("e", "s")))
    assert(merges(1) == (("es", "t")))
    assert(merges(2) == (("l", "o")))

    assert(BpeTrainer.encode("lowest", merges) == Seq("lo", "w", "est"))
    assert(BpeTrainer.encode("newest", merges) == Seq("n", "e", "w", "est"))
    assert(BpeTrainer.encode("low", merges) == Seq("lo", "w"))

    // deterministic across reruns
    assert(BpeTrainer.train(docs, "text", numMerges = 3) == merges)

    // token-count estimator: lowest=3 syms x6 + newest=4 x6 + widest=4 x3
    // + low=2 x7 = 18 + 24 + 12 + 14 = 68
    assert(BpeTrainer.tokenCount(docs, "text", merges) == 68L)
  }

  test("stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text")
    val merges = BpeTrainer.train(docs, "text", numMerges = 5)
    assert(merges.isEmpty) // single-char words have no adjacent pairs
  }
}
