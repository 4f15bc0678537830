package graft.text

import graft.SparkSpec

/** t27: the three splits PARTITION the corpus, fractions sit near the
  * exact hex thresholds (75/12.5/12.5), and assignment is stable across
  * partitionings (pure function of the key).
  */
class SplitAssignSpec extends SparkSpec {

  test("splits partition the corpus at the declared fractions") {
    val rows = TextQueries.t27SplitAssign.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val total = rows.values.sum
    assert(total == graft.core.Tables.load(spark, sf, "documents").count())
    val trainFrac = rows("train").toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.9, s"train fraction $trainFrac")
    assert(rows("val") > 0 && rows("test") > 0)
  }

  test("assignment is partitioning-invariant") {
    val a = TextQueries.t27SplitAssign.fn(spark, sf).collect().map(_.toString).sorted
    // the fn re-reads from dir; loadSpread repartitions — same answer is
    // guaranteed only if assignment never depends on row order
    val b = TextQueries.t27SplitAssign.fn(spark, sf).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
