package graft.expressions

import graft.SparkSpec
import graft.core.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom aggregate + probe: no false negatives, order-independent build,
  * sane false-positive rate, and the prune-then-exact-join identity.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def bitsOf(keys: Seq[Long], parts: Int, numBits: Int = 1 << 16): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .select(Bloom.bloomState(col("k"), numBits).as("b"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives, on any partitioning; identical serialized state") {
    val keys = (1L to 5000L).map(i => i * 2147483647L)
    val b1 = bitsOf(keys, 1)
    val b8 = bitsOf(keys, 8)
    // order-independence: OR-merge makes the bitset a pure function of the set
    assert(java.util.Arrays.equals(b1, b8))
    val members = keys.toDF("k")
      .select(Bloom.bloomContains(col("k"), b1).as("hit"))
      .agg(sum(when(col("hit"), 0).otherwise(1))).head().getLong(0)
    assert(members == 0L, "a member probed false — false negative")
  }

  test("false-positive rate is within ~2x of the sizing formula") {
    val n = 4000
    val numBits = 1 << 16 // ~16.4 bits/key, 5 hashes → p ≈ 0.45% expected
    val bits = bitsOf((1L to n.toLong).map(_ * 7919L), 4, numBits)
    val probes = 20000
    val fps = (1L to probes.toLong).map(i => -i * 104729L).toDF("k")
      .select(Bloom.bloomContains(col("k"), bits).as("hit"))
      .agg(sum(when(col("hit"), 1).otherwise(0))).head().getLong(0)
    assert(fps.toDouble / probes < 0.02, s"fp rate ${fps.toDouble / probes}")
  }

  test("bloom semi-join equals the plain semi-join exactly") {
    val big = graft.core.Tables.load(spark, sf, "lineitem")
    val small = graft.core.Tables.load(spark, sf, "part").filter(col("p_size") >= 40)
    val got = BloomJoin.semiJoin(big, "l_partkey", small, "p_partkey")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val want = big.join(small, col("l_partkey") === col("p_partkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("small-left anti-join equals the plain anti-join, ledger unshuffled") {
    val batch = graft.core.Tables.load(spark, sf, "part")
      .select(col("p_partkey").as("k")).filter(col("k") <= 100)
    val ledger = graft.core.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey").as("k"))
    val got = BloomJoin.antiJoinSmallLeft(batch, "k", ledger, "k")
      .as[Long].collect().toSet
    val want = batch.join(ledger, Seq("k"), "left_anti")
      .as[Long].collect().toSet
    assert(got == want)
    // the ledger side must reach its semi-join bloom-filtered and
    // unshuffled: no Exchange may sit between the ledger scan and the
    // probe Filter
    val plan = BloomJoin.antiJoinSmallLeft(batch, "k", ledger, "k")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("bloom_contains"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  // Pins the aliased join key: with the SAME key name on both sides (the
  // common call shape), the old bare col(bigKey) === col(smallKey)
  // condition failed analysis with AMBIGUOUS_REFERENCE.
  test("semiJoin works when both sides use the same key name") {
    val session = spark
    import session.implicits._
    val big = Seq(1L, 2L, 3L, 4L).toDF("k")
    val small = Seq(2L, 4L, 9L).toDF("k")
    val got = graft.core.BloomJoin.semiJoin(big, "k", small, "k")
    assert(got.columns.toSeq == Seq("k")) // alias never leaks
    assert(got.as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  // Pins the r13 qualified-reference fix (ADVICE round 12): the r12 alias
  // moved the ambiguity rather than removing it — a BIG side already
  // carrying a `__bloom_key` column (or using it as the join key) made the
  // unqualified col("__bloom_key") ambiguous again. The condition now
  // resolves both sides by dataframe (expression id), immune to names.
  test("semiJoin survives a big side that already has a __bloom_key column") {
    val session = spark
    import session.implicits._
    val big = Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "__bloom_key")
    val small = Seq(2L, 3L, 9L).toDF("k")
    val got = graft.core.BloomJoin.semiJoin(big, "k", small, "k")
    assert(got.columns.toSeq == Seq("k", "__bloom_key"))
    assert(got.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // and the key ITSELF named __bloom_key on the big side
    val big2 = Seq(1L, 2L, 5L).toDF("__bloom_key")
    val got2 = graft.core.BloomJoin.semiJoin(big2, "__bloom_key", small, "k")
    assert(got2.as[Long].collect().sorted.toSeq == Seq(2L))
  }

  // The probe derives numBits from the payload length, so a truncated
  // persisted filter would probe different positions than the build —
  // FALSE NEGATIVES from the "no false negatives" prune. Reject what the
  // length can reveal.
  test("truncated or empty persisted bitsets are rejected by name") {
    val bits = bitsOf(Seq(1L, 2L, 3L), 1)
    def msgOf(b: Array[Byte]): String = intercept[IllegalArgumentException](
      Bloom.bloomContains(xxhash64(col("k")), b)).getMessage
    assert(msgOf(bits.dropRight(3)).contains("multiple of 8"))
    assert(msgOf(Array.emptyByteArray).contains("multiple of 8"))
  }

  test("the probe filter stays inside whole-stage codegen") {
    val bits = bitsOf(Seq(1L, 2L, 3L), 1)
    val plan = graft.core.Tables.load(spark, sf, "lineitem")
      .filter(Bloom.bloomContains(xxhash64(col("l_partkey")), bits))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.linesIterator.exists(_.trim.startsWith("* Filter")), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
