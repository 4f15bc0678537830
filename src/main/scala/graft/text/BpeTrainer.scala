package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenizer training as distributed aggregation — the
  * classic merge-learning loop (Sennrich et al., 2016) in its scalable
  * formulation: merges operate on the DISTINCT-WORD table weighted by
  * corpus counts, never on the corpus itself. The corpus is touched once
  * (word count); each merge iteration is one aggregate over the
  * vocabulary (bounded: millions of rows at any corpus size) plus a
  * driver-side argmax of a single row.
  *
  * The learned artifact is the ordered merge list; [[encode]] applies it
  * greedily in learned order — the standard BPE tokenizer contract.
  */
object BpeTrainer {

  /** One vocabulary entry: the word as its current symbol sequence. */
  final case class WordSyms(syms: Seq[String], n: Long)

  /** Learn `numMerges` merge rules from `docs(textCol)`. Deterministic:
    * ties on pair frequency break lexicographically.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // one corpus pass: word → count, then words become char sequences
    var vocab: Dataset[WordSyms] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
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

  /** Corpus token count under the learned tokenizer — the "how many BPE
    * tokens is this dataset" estimator, distributed over documents.
    */
  def tokenCount(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(textCol)).as[String]
      .map(t => t.split(" ").iterator.filter(_.nonEmpty)
        .map(w => encode(w, bc.value).size.toLong).sum)
      .reduce(_ + _)
  }
}
