package graft.text

import graft.SparkSpec

/** t28 importance-resampling invariants. The per-token ratio is
  * (1e6 · c_target) div c_raw with c_target ≤ c_raw, so every score is
  * bounded by 1e6 · n_tok — violated only if the target filter leaks.
  */
class DsirSpec extends SparkSpec {

  test("t28: top-100, bounded scores, English-dominated head") {
    val rows = TextQueries.t28DsirWeights.fn(spark, sf).collect()
    assert(rows.length == 100)
    val perTok = rows.map(_.getAs[Long]("score_per_tok"))
    assert(perTok.forall(s => s >= 0L && s <= 1000000L))
    // registered output order is (score_per_tok DESC, doc_id ASC)
    assert(perTok.toSeq == perTok.toSeq.sorted.reverse)
    // the selected head must skew toward the target domain: join back
    // to langs and require 'en' strictly more frequent than its corpus
    // share (en is ~40% of documents but must dominate the top-100)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val langs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enShare = ids.count(langs(_) == "en").toDouble / ids.size
    val corpusShare = langs.values.count(_ == "en").toDouble / langs.size
    assert(enShare > corpusShare,
      s"importance head en-share $enShare <= corpus share $corpusShare")
  }
}
