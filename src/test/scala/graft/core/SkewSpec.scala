package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted-join equivalence + partitioning tests. */
class SkewSpec extends SparkSpec {

  test("saltedJoin: result equals plain join, partitions by (key, salt)") {
    val session = spark
    import session.implicits._
    // hot key: 1000 rows of key "hot", a few of others
    val skewed = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 2000L), ("b", 3000L))).toDF("k", "row_id")
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("k", "v")

    val salted = Skew.saltedJoin(skewed, dim, "k", col("row_id"), salts = 8)
    val plain = skewed.join(dim, "k")

    assert(salted.count() == plain.count())
    val sSet = salted.select("k", "row_id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val pSet = plain.select("k", "row_id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(sSet == pSet)

    // the exchange hashes on (k, salt), so the hot key spreads
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains(Skew.SaltCol))

    // deterministic across reruns
    val again = Skew.saltedJoin(skewed, dim, "k", col("row_id"), salts = 8)
      .select("k", "row_id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(again == sSet)
  }

  test("saltedJoin: left join keeps unmatched rows exactly once") {
    val session = spark
    import session.implicits._
    val l = Seq(("x", 1L), ("y", 2L)).toDF("k", "row_id")
    val r = Seq(("x", "X")).toDF("k", "v")
    val out = Skew.saltedJoin(l, r, "k", col("row_id"), salts = 4, joinType = "left")
      .collect().map(row => (row.getString(0), Option(row.getString(2)))).toSet
    assert(out == Set(("x", Some("X")), ("y", None)))
  }

  test("saltedJoin rejects join types that preserve the replicated side") {
    import spark.implicits._
    val l = Seq(("x", 1L)).toDF("k", "row_id")
    val r = Seq(("x", "X"), ("z", "Z")).toDF("k", "v")
    // a right join would emit salts null-extended copies of the unmatched
    // replicated key z — result-visible salting
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "k", col("row_id"), salts = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "k", col("row_id"), salts = 4, joinType = "full_outer")
    }
  }

  test("saltedJoin rejects inputs already carrying the reserved salt column") {
    import spark.implicits._
    val l = Seq(("x", 1L, 9)).toDF("k", "row_id", Skew.SaltCol)
    val r = Seq(("x", "X")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "k", col("row_id"), salts = 4)
    }
  }
}

