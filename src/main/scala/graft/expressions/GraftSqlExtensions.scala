package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the graft native expressions, injected through
  * `SparkSessionExtensions` — the (c)-tier integration path: users of the
  * pure-SQL API (`spark.sql`) get the same codegen kernels as the Column
  * API, e.g.
  *
  * {{{
  *   SELECT doc_id, simhash64(text) FROM documents
  *   SELECT jaccard_sorted(shingle_hashes(a.text, 3), shingle_hashes(b.text, 3)) ...
  * }}}
  *
  * Wire with `.withExtensions(new GraftSqlExtensions)` (GraftSession does)
  * or `spark.sql.extensions=graft.expressions.GraftSqlExtensions`.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExpressions._

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(GraftExpressions.getClass.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of whitespace tokens"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)))

    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - order-sensitive token fingerprint"),
      (es: Seq[Expression]) => RollingHashExpr(es.head)))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - sorted distinct n-gram hashes"),
      (es: Seq[Expression]) => ShingleHashesExpr(es.head, litInt(es(1), "n"))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSigExpr(es.head, litInt(es(1), "k"))))

    ext.injectFunction((FunctionIdentifier("band_hashes"),
      info("band_hashes", "band_hashes(sig, bands) - LSH band bucket keys"),
      (es: Seq[Expression]) => BandHashesExpr(es.head, litInt(es(1), "bands"))))

    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted", "jaccard_sorted(a, b) - exact Jaccard of sorted hash sets"),
      (es: Seq[Expression]) => JaccardSortedExpr(es.head, es(1))))

    ext.injectFunction((FunctionIdentifier("cosine_f"),
      info("cosine_f", "cosine_f(a, b) - exact cosine of float vectors"),
      (es: Seq[Expression]) => CosineSimFExpr(es.head, es(1))))

    ext.injectFunction((FunctionIdentifier("kgram_hashes"),
      info("kgram_hashes",
        "kgram_hashes(text, n) - positional word k-gram hashes (order kept)"),
      (es: Seq[Expression]) => KgramHashesExpr(es.head, litInt(es(1), "n"))))

    ext.injectFunction((FunctionIdentifier("embed_shingles"),
      info("embed_shingles",
        "embed_shingles(text, n, dim) - L2-normalized feature-hashed shingle embedding"),
      (es: Seq[Expression]) => EmbedShinglesExpr(es.head, litInt(es(1), "n"),
        litInt(es(2), "dim"))))

    ext.injectFunction((FunctionIdentifier("word_bigrams"),
      info("word_bigrams",
        "word_bigrams(text) - generator: one row per adjacent non-empty word pair"),
      (es: Seq[Expression]) => WordBigramsExpr(es.head)))

    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(hash, k) - KMV distinct-count sketch estimate (deterministic)"),
      (es: Seq[Expression]) =>
        KmvDistinctExpr(es.head, litInt(es(1), "k")).toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("kmv_state"),
      info("kmv_state",
        "kmv_state(hash, k) - serialized KMV sketch (persistable binary state)"),
      (es: Seq[Expression]) =>
        KmvStateExpr(es.head, litInt(es(1), "k")).toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("kmv_intersect"),
      info("kmv_intersect",
        "kmv_intersect(sk_a, sk_b, k) - intersection-size estimate of two KMV sketches"),
      (es: Seq[Expression]) => KmvIntersectExpr(es.head, es(1), litInt(es(2), "k"))))

    ext.injectFunction((FunctionIdentifier("kmv_difference"),
      info("kmv_difference",
        "kmv_difference(sk_a, sk_b, k) - set-difference estimate |A\\\\B| of two KMV sketches"),
      (es: Seq[Expression]) => KmvDifferenceExpr(es.head, es(1), litInt(es(2), "k"))))

    ext.injectFunction((FunctionIdentifier("zorder"),
      info("zorder",
        "zorder(x, y) - Morton interleave of two 31-bit-normalized longs"),
      (es: Seq[Expression]) => ZOrderExpr(es.head, es(1))))

    ext.injectFunction((FunctionIdentifier("top_k"),
      info("top_k",
        "top_k(value, id, k) - per-group top-k (value DESC, id ASC) as {value,id} structs"),
      (es: Seq[Expression]) =>
        TopKAggExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(es.head,
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(es(1),
            org.apache.spark.sql.types.LongType),
          litInt(es(2), "k")).toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("bloom_state"),
      info("bloom_state",
        "bloom_state(hash, numBits, numHashes) - serialized bloom bitset over a long column"),
      (es: Seq[Expression]) =>
        BloomStateExpr(es.head, litInt(es(1), "numBits"),
          litInt(es(2), "numHashes")).toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("cms_state"),
      info("cms_state",
        "cms_state(hash, width, depth) - serialized Count-Min frequency grid over a long column"),
      (es: Seq[Expression]) =>
        CmsStateExpr(es.head, litInt(es(1), "width"),
          litInt(es(2), "depth")).toAggregateExpression()))

    // library-level optimizer rule: fuse the size(filter(split(...)))
    // token-count idiom into one codegen kernel (see FuseTokenCount)
    ext.injectOptimizerRule(_ => FuseTokenCount)

    // scan-pruning rule: epoch-range filters over the normalized events
    // ts projection gain an implied bare-column bound the parquet source
    // can push (see TsRangePushdown)
    ext.injectOptimizerRule(_ => graft.plans.TsRangePushdown)

    // same mechanism one level up the storage hierarchy: epoch-range
    // filters over a REGISTERED day-partitioned store gain an implied
    // partition-column bound that prunes whole directories (see
    // DerivedPartitionPushdown)
    ext.injectOptimizerRule(_ => graft.plans.DerivedPartitionPushdown)

    // whole-operator tier: the merge-based as-of join physical plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
