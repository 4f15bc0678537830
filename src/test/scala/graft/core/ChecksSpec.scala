package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[Checks.report]] edge contracts fixed in round 11: an empty
  * input reports 0 violations (never NULL), a RefIntegrity-only check set
  * doesn't poison the union's n_violations type through an empty map()
  * unpivot, and an empty check list yields an empty, correctly-typed
  * frame. q42 covers the populated path against the DuckDB oracle.
  */
class ChecksSpec extends SparkSpec {

  import Checks._
  import spark.implicits._

  private val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("empty input: row-local and unique checks report 0 violations, not NULL") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = report(empty, Seq(
      NotNull("k"), InRange("v", 0.0, 1.0), Matches("k", "^[0-9]+$"),
      Unique(Seq("k")))).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_violations")),
        s"${r.getString(0)} reported NULL on empty input")
      assert(r.getLong(r.fieldIndex("n_violations")) == 0L)
      assert(r.getLong(r.fieldIndex("n_rows")) == 0L)
    }
  }

  test("RefIntegrity-only check set: long-typed counts, no empty-map unpivot") {
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val out = report(child, Seq(RefIntegrity("fk", parent, "pk")))
    assert(out.schema("n_violations").dataType ==
      org.apache.spark.sql.types.LongType)
    val r = out.collect().head
    assert(r.getString(0) == "ref:fk")
    assert(r.getLong(1) == 2L) // both 9s are orphans
    assert(r.getLong(2) == 4L)
  }

  test("empty check list yields an empty frame with the report schema") {
    val out = report(Seq((1L, 0.5)).toDF("k", "v"), Seq.empty)
    assert(out.columns.toSeq == Seq("check_name", "n_violations", "n_rows"))
    assert(out.count() == 0L)
  }

  test("mixed set on populated input: each family counts independently") {
    val df = Seq(
      (Some(1L), 5.0, "A"),
      (Some(1L), 50.0, "X"), // dup key, out of range, pattern miss
      (None, 0.5, "R"))
      .toDF("k", "v", "f")
    val out = report(df, Seq(
      NotNull("k"), InRange("v", 0.0, 10.0), Matches("f", "^[ANR]$"),
      Unique(Seq("k")), RefIntegrity("k", parent.select(col("pk").as("k")), "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null:k") == 1L)
    assert(out("in_range:v[0.0,10.0]") == 1L)
    assert(out("matches:f:^[ANR]$") == 1L)
    // 3 rows; distinct key-structs = {struct(1), struct(null)} (a struct
    // wrapping a null is itself non-null, so null keys count as one group)
    assert(out("unique:k") == 1L)
    assert(out("ref:k") >= 1L) // the null k never matches a parent
  }

  // Sweep #6: check names are DATA-BORNE identifiers (a Matches name
  // embeds its user-supplied regex) — an embedded backtick used to crash
  // the unpivot's quoted column reference (the FlowAnalyzer step-name
  // class). Doubled backticks now survive.
  test("a regex containing a backtick does not break the report unpivot") {
    val df = Seq("a`b", "plain").toDF("f")
    val out = report(df, Seq(Matches("f", "^a`b$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("matches:f:^a`b$") == 1L) // "plain" misses the pattern
  }

  test("Unique with no key columns is rejected by name") {
    val e = intercept[IllegalArgumentException](Unique(Seq.empty))
    assert(e.getMessage.contains("at least one key column"))
  }
}
