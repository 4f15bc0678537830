package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Converts the round-12 sweep-4 "reviewed dry" EMPTY-INPUT claims into
  * pins. The same sweep's labelSum claim ("empty edges converge
  * immediately") turned out to be an NPE when actually executed — these
  * are the remaining assertions of that family, now run instead of
  * argued: a global TypedImperativeAggregate over zero rows must yield
  * one row holding a valid ZEROED sketch, and every consumer must treat
  * it as "nothing present", not crash.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def noKeys = Seq.empty[Long].toDF("k")

  test("BloomJoin.semiJoin with an empty small side matches nothing") {
    val big = Seq(1L, 2L, 3L).toDF("k")
    assert(BloomJoin.semiJoin(big, "k", noKeys, "k").count() == 0L)
  }

  test("BloomJoin.antiJoinSmallLeft passes an empty batch / full batch correctly") {
    val ledger = Seq(1L, 2L).toDF("k")
    // empty batch against a real ledger: nothing to emit
    assert(BloomJoin.antiJoinSmallLeft(noKeys, "k", ledger, "k").count() == 0L)
    // real batch against an EMPTY ledger: everything is fresh
    val batch = Seq(5L, 6L).toDF("k")
    assert(BloomJoin.antiJoinSmallLeft(batch, "k", noKeys, "k").count() == 2L)
  }

  test("HeavyHitters.exact over zero rows returns zero hitters") {
    assert(HeavyHitters.exact(noKeys, "k", total => (total / 10) max 1).count() == 0L)
  }

  test("jaccardJoin over an empty corpus returns zero pairs") {
    assert(graft.dedup.Dedup
      .jaccardJoin(noDocs, "doc_id", "text", threshold = 0.5).count() == 0L)
  }

  test("minhashNearDupPairs over an empty corpus returns zero pairs") {
    assert(graft.dedup.Dedup
      .minhashNearDupPairs(noDocs, "doc_id", "text").count() == 0L)
  }
}
