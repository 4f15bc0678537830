package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenizer training as distributed aggregation — the
  * classic merge-learning loop (Sennrich et al., 2016) in its scalable
  * formulation: merges operate on the DISTINCT-WORD table weighted by
  * corpus counts, never on the corpus itself. The corpus is touched once
  * (word count — the only input-sized job); the merge loop then runs
  * driver-locally over the collected vocabulary with an incremental
  * pair-count index, so a production 32k-merge run is ONE Spark job plus
  * in-memory updates — not 32k sequential cluster jobs.
  *
  * Why not batch top-m merges per distributed pass instead: batch
  * selection cannot reproduce the sequential semantics — applying the top
  * pair creates NEW pairs that may outrank the rest of the batch (the
  * textbook corpus itself: merging (e,s) creates (es,t), which ties the
  * next count and wins — a from-scratch top-2 batch would pick (l,o)).
  * The distinct-word table is bounded (vocabulary, not corpus: even a
  * web-scale corpus has ~1e7-1e8 distinct words), so localizing it after
  * the one corpus aggregate is both exact and driver-safe; a vocabulary
  * over `localVocabLimit` falls back to the one-job-per-merge distributed
  * loop ([[trainDistributed]]) rather than risking driver memory.
  *
  * The learned artifact is the ordered merge list; [[encode]] applies it
  * greedily in learned order — the standard BPE tokenizer contract.
  */
object BpeTrainer {

  /** One vocabulary entry: the word as its current symbol sequence. */
  final case class WordSyms(syms: Seq[String], n: Long)

  /** Distinct-word counts — the ONE corpus-sized aggregation. */
  private def wordCounts(docs: DataFrame, textCol: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
  }

  /** Learn `numMerges` merge rules from `docs(textCol)`. Deterministic:
    * ties on pair frequency break lexicographically.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      localVocabLimit: Long = 4000000L): Seq[(String, String)] = {
    val wc = wordCounts(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (wc.count() <= localVocabLimit)
        trainLocal(wc.collect().map { case (w, n) => (w.map(_.toString), n) }, numMerges)
      else trainDistributed(wc, numMerges)
    } finally { wc.unpersist(blocking = false); () }
  }

  /** Exact sequential BPE over an in-memory vocabulary with an incremental
    * pair index: per merge, only the words containing the merged pair are
    * touched, and a TreeSet keyed (-count, a, b) yields the argmax in
    * O(log P). Identical results to [[trainDistributed]] (spec-pinned).
    */
  def trainLocal(vocab: Array[(Seq[String], Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Seq[String]] = vocab.map(_._1)
    val wn: Array[Long] = vocab.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // head = highest count, then lexicographically smallest pair
    val queue = mutable.TreeSet.empty[(Long, String, String)]

    def bump(p: (String, String), delta: Long): Unit = {
      val old = pairCount.getOrElse(p, 0L)
      if (old > 0) queue.remove((-old, p._1, p._2))
      val nu = old + delta
      if (nu > 0) { pairCount(p) = nu; queue.add((-nu, p._1, p._2)); () }
      else { pairCount.remove(p); () }
    }
    def pairsOf(syms: Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))

    var wid = 0
    while (wid < words.length) {
      pairsOf(words(wid)).foreach { p =>
        bump(p, wn(wid))
        pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wid
      }
      wid += 1
    }

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < numMerges && queue.nonEmpty) {
      val (_, a, b) = queue.head
      merges += ((a, b))
      val affected = pairWords.getOrElse((a, b), mutable.BitSet.empty).toArray
      affected.foreach { w =>
        val old = words(w)
        val n = wn(w)
        pairsOf(old).foreach { p =>
          bump(p, -n)
          pairWords.get(p).foreach(_ -= w)
        }
        val neu = mergePair(old, a, b)
        words(w) = neu
        pairsOf(neu).foreach { p =>
          bump(p, n)
          pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += w
        }
      }
      i += 1
    }
    merges.result()
  }

  /** The one-Spark-job-per-merge loop — the fallback for vocabularies too
    * large to localize. Each iteration: one pair-count aggregate over the
    * vocab table + a 1-row argmax collect + a full remap.
    */
  def trainDistributed(wc: Dataset[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var vocab: Dataset[WordSyms] = wc
      .map { case (w, n) => WordSyms(w.map(_.toString), n) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = vocab
        .flatMap(ws => ws.syms.sliding(2).collect {
          case Seq(a, b) => ((a, b), ws.n)
        })
        .groupByKey(_._1)
        .mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, _) = top(0)
        merges += ((a, b))
        val next = vocab.map(ws => WordSyms(mergePair(ws.syms, a, b), ws.n))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    vocab.unpersist()
    merges.result()
  }

  /** Replace every adjacent (a, b) with a+b, left to right. */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val arr = syms.toIndexedSeq
    while (i < arr.length) {
      if (i + 1 < arr.length && arr(i) == a && arr(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += arr(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word with the learned merges (greedy, learned order). */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Serving-path encoder: repeatedly apply the LOWEST-RANK merge present
    * in the word — identical results to [[encode]]'s in-order fold
    * (spec-pinned), but per-word cost scales with the word, not the merge
    * list: a 32k-merge production vocabulary costs a hash probe per
    * adjacent pair per round instead of 32k full passes. Build once,
    * reuse across a partition (the broadcast-tokenizer shape).
    */
  def encoder(merges: Seq[(String, String)]): String => Seq[String] = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    (word: String) => {
      var syms: Seq[String] = word.map(_.toString)
      var continue = syms.lengthCompare(2) >= 0
      while (continue) {
        var best: (String, String) = null
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
          i += 1
        }
        if (best == null) continue = false
        else syms = mergePair(syms, best._1, best._2)
      }
      syms
    }
  }

  /** Corpus token count under the learned tokenizer — the "how many BPE
    * tokens is this dataset" estimator, distributed over documents.
    */
  def tokenCount(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val enc = encoder(bc.value) // rank map built once per partition
        it.map(t => t.split(" ").iterator.filter(_.nonEmpty)
          .map(w => enc(w).size.toLong).sum)
      }
      // agg-sum, not reduce: reduce throws on an EMPTY corpus, where the
      // only honest token count is 0
      .toDF("n").agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
  }
}
