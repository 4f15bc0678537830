package graft.catalog

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** c8's plan must agree with the REAL vacuum: version dirs whose every
  * bucket the plan calls reclaimable get deleted, dirs holding any live
  * bucket survive, and the surviving table reads back unchanged.
  */
class ExpiryPlanSpec extends SparkSpec {

  test("c8 expiry plan matches vacuum(keep=2) and preserves the table") {
    val t = java.nio.file.Files.createTempDirectory("graft-c8-spec")
      .toString + "/table"
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    BucketedMerge.mergeInto(spark, t, o, Seq("o_orderkey"), nBuckets = 16)
    val b = BucketedMerge.bucketExpr(Seq("o_orderkey"), 16)
    Seq(Seq(0, 1, 2), Seq(3, 4), Seq(0, 5)).zipWithIndex.foreach {
      case (bs, i) =>
        BucketedMerge.mergeInto(spark, t,
          o.filter(b.isin(bs: _*))
            .withColumn("o_totalprice", col("o_totalprice") + i + 1),
          Seq("o_orderkey"))
    }
    val plan = CatalogQueries.expiryPlan(spark, t).collect()
    assert(plan.length == 4) // v0..v3 all wrote at least one bucket
    // pointer sharing is real: some old version must still be partly live
    assert(plan.exists(r => r.getAs[Long]("data_version") < 2 &&
      r.getAs[Long]("n_live") > 0))
    val before = BucketedMerge.read(spark, t)
      .collect().map(_.toString).sorted

    BucketedMerge.vacuum(t, keep = 2)

    plan.foreach { r =>
      val dv = r.getAs[Long]("data_version")
      val exists = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$t/v=$dv"))
      if (r.getAs[Long]("n_live") == 0L)
        assert(!exists, s"v=$dv fully reclaimable but survived vacuum")
      else
        assert(exists, s"v=$dv holds live buckets but vacuum deleted it")
    }
    val after = BucketedMerge.read(spark, t)
      .collect().map(_.toString).sorted
    assert(before.toSeq == after.toSeq)
  }
}
