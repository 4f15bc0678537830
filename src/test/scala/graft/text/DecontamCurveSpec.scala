package graft.text

import graft.SparkSpec

class DecontamCurveSpec extends SparkSpec {

  test("t31: contaminated-doc counts shrink as the shingle widens") {
    val rows = TextQueries.t31DecontamCurve.fn(spark, sf).collect()
      .sortBy(_.getAs[Int]("n"))
    assert(rows.map(_.getAs[Int]("n")).toSeq == Seq(4, 8, 16))
    // a shared 16-gram contains shared 8-grams contains shared 4-grams:
    // the contaminated sets are nested, so counts are non-increasing
    val docs = rows.map(_.getAs[Long]("n_contaminated_docs"))
    assert(docs(0) >= docs(1) && docs(1) >= docs(2), docs.mkString(","))
    val kg = rows.map(_.getAs[Long]("n_hit_kgrams"))
    assert(kg(0) >= kg(1) && kg(1) >= kg(2), kg.mkString(","))
    // screenable coverage can only shrink with width (docs shorter than
    // the shingle produce no shingles at that n)
    val trains = rows.map(_.getAs[Long]("n_train_docs"))
    assert(trains(0) >= trains(1) && trains(1) >= trains(2),
      trains.mkString(","))
  }
}
