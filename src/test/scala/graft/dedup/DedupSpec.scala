package graft.dedup

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Dedup-operator invariants not covered by the DuckDB oracle. */
class DedupSpec extends SparkSpec {

  test("simhash: identical text -> identical signature; hamming 0") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence altogether now"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 6)
  }

  test("dedupClusters: multi-hop chains collapse to the min-id component") {
    val session = spark
    import session.implicits._
    // two components: a chain 1-2-3-4 (diameter 3 — needs propagation
    // rounds, not just direct neighbors) and a pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // partitioning-invariant
    val again = Dedup.dedupClusters(pairs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("dedupClusters: empty pair set converges to an empty result") {
    val session = spark
    import session.implicits._
    // SUM over no rows is NULL — the convergence compare NPE'd on an
    // empty input before labelSum coalesced it to zero
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(none).collect().isEmpty)
  }

  test("dedupClusters: long chain drives many propagation rounds; negative ids") {
    val session = spark
    import session.implicits._
    // chain -3 .. 4 (diameter 7 — seven rounds before the sum-based
    // convergence check may fire; negative labels exercise the signed
    // side of the exact label-sum termination)
    val ids = (-3L to 4L).toSeq
    val pairs = ids.zip(ids.tail).map { case (a, b) => (b, a) }
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ids.map(_ -> -3L).toMap)
  }

  test("incrementalDedupKeyed: ledger rejection + within-batch first-wins") {
    val session = spark
    import session.implicits._
    val batch = Seq(
      (10L, "k_old"),  // in ledger -> rejected
      (11L, "k_new"),  // fresh, first occurrence -> admitted
      (12L, "k_new"),  // second occurrence within batch -> loses to 11
      (13L, "k_also")) // fresh -> admitted
      .toDF("doc_id", "content_key")
    val ledger = Seq("k_old", "k_other").toDF("content_key")
    val got = Dedup.incrementalDedupKeyed(batch, ledger)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(11L -> "k_new", 13L -> "k_also"))
    // and the text-hashing front door reduces to the same contract
    val textBatch = Seq((10L, "aaa"), (11L, "bbb"), (12L, "bbb"))
      .toDF("id", "body")
    val textLedger = Seq("aaa").toDF("k")
      .select(sha2(col("k"), 256).as("content_key"))
    val got2 = Dedup.incrementalDedup(textBatch, "id", "body", textLedger)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(11L))
  }

  test("d3 band-pair blocking is complete vs brute force") {
    val lsh = DedupQueries.d3Simhash.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet

    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", Dedup.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= 6)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Number]("hamming").longValue())).toSet

    assert(lsh == brute)
    assert(brute.nonEmpty) // fixture actually exercises the path
  }

  test("embedShingles: unit norm, deterministic, near-dup gap, zero for short text") {
    val session = spark
    import session.implicits._
    import graft.expressions.GraftExpressions.embedShingles
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely unrelated text about spark query engines and shuffles"),
      (4L, "too short")) // < 3 tokens -> zero vector
      .toDF("doc_id", "text")
      .select(col("doc_id"), embedShingles(col("text"), 3, 512).as("vec"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(rows(1L)) - 1.0) < 1e-6)
    assert(norm(rows(4L)) == 0.0)
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(rows(1L), rows(2L)) > 0.7)   // near-dup: one shingle run differs
    assert(cos(rows(1L), rows(3L)) < 0.2)   // unrelated: background level
    // deterministic across evaluations
    val again = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(rows(1L).sameElements(again(1L)))
  }

  test("d5 LSH embedding near-dup is complete vs brute force") {
    val vecs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.expressions.GraftExpressions.embedShingles(col("text"), 3, 512).as("vec"))
      .filter(array_max(col("vec")) > 0f)
    val lsh = DedupQueries.d5EmbeddingNearDup.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = vecs.select(col("doc_id").as("doc_a"), col("vec").as("va"))
    val b = vecs.select(col("doc_id").as("doc_b"), col("vec").as("vb"))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("cos", graft.functions.VectorFunctions.cosineFast(col("va"), col("vb")))
      .filter(col("cos") >= 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh == brute)
    assert(brute.nonEmpty)
  }

  test("d6 duplicate-span detection matches literal k-gram brute force") {
    val session = spark
    import session.implicits._
    // hashed positional k-grams must flag exactly the positions the
    // literal k-gram strings flag (collision-free at this scale)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val k = 8
    val literal = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - k).map(i => (id, i, toks.slice(i, i + k).mkString(" ")))
    }
    val counts = literal.groupBy(_._3).view.mapValues(_.size).toMap
    val brute = literal.groupBy(_._1).map { case (id, ks) =>
      id -> ((ks.size.toLong, ks.count(g => counts(g._3) > 1).toLong))
    }
    val got = DedupQueries.d6DupSpans.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kgrams"), r.getAs[Long]("n_dup")))).toMap
    assert(got == brute)
    assert(got.values.exists(_._2 > 0)) // planted duplicates produce span mass
  }

  test("jaccardJoin prefix filtering is complete vs brute force") {
    val docs = Tables.load(spark, sf, "documents")
    val t = 0.5
    val prefixed = Dedup.jaccardJoin(docs, "doc_id", "text", t, n = 2,
      blockCol = Some("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sh = docs.select(col("doc_id"), col("source"),
      Dedup.shingleHashes(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(sh.select(col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= t)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    assert(prefixed == brute)
    assert(brute.nonEmpty)
  }

  test("d11: the representative is its cluster's longest member") {
    val reps = DedupQueries.d11CanonicalSelect.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(reps.nonEmpty)
    val members = DedupQueries.d8DedupClusters.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byCluster = members.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    reps.foreach { case (cluster, rep, repChars, nMembers, nDropped) =>
      val ms = byCluster(cluster)
      assert(ms.contains(rep))
      assert(nMembers == ms.length && nDropped == nMembers - 1)
      assert(repChars == chars(rep))
      assert(ms.forall(m => chars(m) < repChars ||
        (chars(m) == repChars && m >= rep))) // longest, tie -> lowest id
    }
    // every multi-member cluster from d8 has exactly one manifest row
    assert(reps.map(_._1).toSet ==
      byCluster.filter(_._2.length >= 2).keySet)
  }
}
