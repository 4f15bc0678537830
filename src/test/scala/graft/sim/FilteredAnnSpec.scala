package graft.sim

import graft.SparkSpec

/** s8 hybrid search: every returned neighbor satisfies the metadata
  * predicate, and the filter is non-vacuous (results differ from the
  * unfiltered IVF search).
  */
class FilteredAnnSpec extends SparkSpec {

  test("neighbors satisfy the predicate; filter is non-vacuous") {
    val rows = SimilarityQueries.s8FilteredAnn.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n) => n % 3 == 0 },
      "a neighbor escaped the metadata predicate")
    val unfiltered = SimilarityQueries.s3AnnIvf.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rows.exists(p => !unfiltered.contains(p)),
      "filtered search returned a subset of the unfiltered one — vacuous")
  }
}
