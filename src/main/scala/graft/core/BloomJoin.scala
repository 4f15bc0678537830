package graft.core

import graft.expressions.Bloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered exact semi-join: prune the big side BEFORE its
  * shuffle with a broadcast bloom filter built over the small side's keys,
  * then run the exact semi-join on what survives.
  *
  * At 100 TB the semi-join's cost is shuffling the big side; when the
  * selectivity is low (most big-side rows match nothing), almost all of
  * that shuffle is waste. A bloom over the small side's keys is a few MB
  * regardless of the big side's size, prunes non-matching rows AT THE SCAN
  * (the probe is one codegen call per row, no exchange crossed), and can
  * never drop a matching row — so the exact join downstream guarantees the
  * final result is IDENTICAL to the plain semi-join, which is exactly how
  * q28's oracle verifies it. Spark's own `InjectRuntimeFilter` applies this
  * rewrite automatically under size heuristics; the library form makes it
  * deterministic, persistable (the bitset is a value) and reusable across
  * queries/scans of the same key set.
  *
  * Sizing: ~10 bits/key ≈ 1% false positives at 5 hashes; the default
  * 2^23 bits (1 MiB) covers ~800k keys. The build collects the bitset to
  * the driver — numBits/8 bytes, independent of data size (the same shape
  * as Spark's runtime-filter scalar subquery, capped there at 8 MB).
  */
object BloomJoin {

  /** Rows of `big` whose `bigKey` appears in `small`'s `smallKey` —
    * exact left-semi semantics. Keys of any orderable type: both sides are
    * normalized through `xxhash64` for the bloom probe; the final semi-join
    * runs on the raw key column.
    */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
               numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val bits = small
      .select(Bloom.bloomState(xxhash64(col(smallKey)), numBits, numHashes).as("b"))
      .head().getAs[Array[Byte]](0)
    // the small side's key is aliased before the join condition: with
    // bigKey == smallKey (the COMMON case — same key, two tables) the
    // bare `col(bigKey) === col(smallKey)` is an AMBIGUOUS_REFERENCE
    // analysis error. Semi-join output carries only big's columns, so
    // the alias never leaks. Both condition sides are DATAFRAME-QUALIFIED
    // (resolved by expression id, not name): an unqualified
    // col("__bloom_key") re-ambiguated whenever `big` itself carried a
    // column of that name (or bigKey was literally "__bloom_key").
    val keyRef = small.select(col(smallKey).as("__bloom_key")).distinct()
    val pruned = big
      .filter(Bloom.bloomContains(xxhash64(col(bigKey)), bits, numHashes))
    pruned.join(keyRef, pruned(bigKey) === keyRef("__bloom_key"), "left_semi")
  }

  /** Rows of `small` whose `smallKey` does NOT appear in `big` — exact
    * left-anti semantics for the batch-vs-ledger shape (a micro-batch
    * screened against a corpus-lifetime key table). A plain anti-join
    * shuffles BOTH sides on the key — at scale that reshuffles the whole
    * ledger every batch. Here the ledger never moves: its scan is pruned
    * by a broadcast bloom of the batch keys (codegen probe, no exchange),
    * the few survivors semi-join against the batch keys to drop bloom
    * false positives, and the resulting matched-key set — at most
    * |batch| rows — broadcasts back for the final anti-join. Total
    * exchanged bytes are O(|batch|), independent of ledger size.
    */
  def antiJoinSmallLeft(small: DataFrame, smallKey: String, big: DataFrame,
      bigKey: String, numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    val bits = keys
      .select(Bloom.bloomState(xxhash64(col(smallKey)), numBits, numHashes).as("b"))
      .head().getAs[Array[Byte]](0)
    val matched = big
      .select(col(bigKey).as(smallKey))
      .filter(Bloom.bloomContains(xxhash64(col(smallKey)), bits, numHashes))
      .join(broadcast(keys), Seq(smallKey), "left_semi")
      .distinct()
    small.join(broadcast(matched), Seq(smallKey), "left_anti")
  }
}
