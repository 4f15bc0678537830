package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("local incremental loop is exactly the sequential distributed result") {
    // busy corpus: overlapping repeats, ties, merged symbols that re-pair
    val docs = Seq(
      "aaaa aaab abab banana bandana ananas",
      "the then there these theses sesame",
      "lowest newest widest low lower lowest",
      "mississippi missive permission emission").toDF("text")
    val seqMerges = BpeTrainer.trainDistributed(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n")).as[(String, Long)], 12)
    val localMerges = BpeTrainer.train(docs, "text", numMerges = 12)
    assert(localMerges == seqMerges)
    // encoding agrees end to end
    assert(BpeTrainer.encode("missions", localMerges) ==
      BpeTrainer.encode("missions", seqMerges))
  }

  test("training is one corpus job, not one job per merge") {
    val docs = Seq.tabulate(50)(i => s"alpha$i beta$i gamma delta").toDF("text")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = BpeTrainer.train(docs, "text", numMerges = 40)
      assert(merges.size == 40)
      // let the async listener bus drain (counter stable twice in a row)
      var last = -1
      var stable = 0
      var spins = 0
      while (stable < 2 && spins < 50) {
        Thread.sleep(100)
        if (counter.get() == last) stable += 1 else { stable = 0; last = counter.get() }
        spins += 1
      }
      // count + collect over the word table — a handful of jobs total,
      // independent of numMerges (the old loop would need 80+)
      assert(counter.get() <= 6, s"saw ${counter.get()} jobs for 40 merges")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("rank-greedy encoder equals the in-order fold on corpus and random words") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val merges = BpeTrainer.train(docs, "text", numMerges = 40)
    val enc = BpeTrainer.encoder(merges)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    words.foreach { w =>
      assert(enc(w) == BpeTrainer.encode(w, merges), s"word $w")
    }
    // adversarial: words not in the training corpus
    Seq("zzz", "joinjoinjoin", "a", "streamstream", "xqv").foreach { w =>
      assert(enc(w) == BpeTrainer.encode(w, merges), s"oov word $w")
      assert(enc(w).mkString == w, "concatenation must be preserved")
    }
  }
}
