package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact: group by content digest (32-byte key, never the full text —
  *    the shuffle carries hashes, not documents);
  *  - MinHash + LSH: per-row signature (codegen'd HOFs), band → bucket
  *    shuffle where only same-bucket docs meet (candidate generation is
  *    O(n·bands), not O(n²)), exact Jaccard verify on candidates only;
  *  - SimHash: per-row 64-bit signature for hamming-distance near-dup.
  *
  * At 100 TB the only all-to-all movement is the banded bucket shuffle of
  * (band_hash, doc_id, shingle-hash set) — tune bands/rows to trade recall
  * vs shuffle width.
  */
object Dedup {

  /** Word n-gram shingles of `text` as strings (1 row per position). */
  def shingleWords(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
  }

  /** Word n-gram shingles of `text`, deduplicated, as xxhash64 longs
    * (hash-shingling keeps the bucket shuffle narrow: 8 bytes per shingle).
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingleWords(text, n), xxhash64(_)))

  /** k MinHash values over a shingle-hash array: min over shingles of k
    * salted re-hashes (xxhash64(h, salt) — overflow-free under ANSI mode
    * and an excellent permutation approximation).
    */
  def minhash(shingles: Column, k: Int = 64): Column = {
    val mins = (0 until k).map(i =>
      array_min(transform(shingles, h => xxhash64(h, lit(i)))))
    array(mins: _*)
  }

  /** LSH band hashes: split the k-signature into `bands` bands and hash
    * each; docs sharing any band hash become candidate pairs.
    */
  def bandHashes(sig: Column, k: Int = 64, bands: Int = 16): Column = {
    val rows = k / bands
    val hs = (0 until bands).map(b => xxhash64(slice(sig, b * rows + 1, rows)))
    array(hs: _*)
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * Jaccard over the shingle-hash sets. Returns (doc_a, doc_b, jaccard)
    * with doc_a < doc_b, jaccard >= threshold.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh.select(
      col("doc_id"), col("sh"),
      posexplode(bandHashes(minhash(col("sh"), k), k, bands)).as(Seq("band_id", "band_hash")))
    // same-bucket join; dedup candidate pairs before the (costlier) verify
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val cands = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, signed
    * bit-vote per bit position, sign → bit. Near-dup docs differ in few
    * bits (hamming distance on the returned long).
    */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, masks,
          (v, m) => v + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
