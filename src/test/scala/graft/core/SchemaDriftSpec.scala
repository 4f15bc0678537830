package graft.core

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the engine's ASSUMPTION surface against the driver-generated
  * testdata — the environment-drift gate, generalized from the round-5
  * events.ts break (a testdata regeneration changed one parquet type and
  * silently took out a third of the query board; the failure surfaced as
  * 29 scattered analysis errors instead of one named diff).
  *
  * Each assertion is an invariant some query genuinely RELIES on, stated
  * at the loosest level that keeps those queries correct — exact types
  * where arithmetic depends on them (ts ns-longs, float embeddings),
  * type FAMILIES where queries only need orderability (the date
  * columns, which work as DATE or any TIMESTAMP flavor). When the
  * driver regenerates testdata, this spec either stays green (harmless
  * drift) or fails naming the exact table/column/type that moved.
  */
class SchemaDriftSpec extends SparkSpec {

  private def loaded(name: String) = Tables.load(spark, sf, name).schema

  private def assertField(table: String, field: String,
      ok: DataType => Boolean, want: String): Unit = {
    val sch = loaded(table)
    assert(sch.fieldNames.contains(field), s"$table.$field missing: $sch")
    val dt = sch(field).dataType
    assert(ok(dt), s"$table.$field is $dt, engine assumes $want")
  }

  private val integral: DataType => Boolean =
    dt => dt == LongType || dt == IntegerType
  private val orderableDate: DataType => Boolean =
    dt => dt == DateType || dt == TimestampType || dt == TimestampNTZType

  test("events: the normalized contract every epoch query assumes") {
    assertField("events", "ts", _ == LongType, "ns-epoch long (Tables.load)")
    assertField("events", "event_id", integral, "integral id")
    assertField("events", "user_id", integral, "integral id")
    assertField("events", "event_type", _ == StringType, "string")
    assertField("events", "value", _ == DoubleType, "double (money detour)")
  }

  test("events: JSON props column parseable as string") {
    assertField("events", "props", _ == StringType,
      "string (from_json / json-path queries)")
  }

  test("orders: keys integral, money double, dates orderable, statuses string") {
    assertField("orders", "o_orderkey", integral, "integral key")
    assertField("orders", "o_custkey", integral, "integral key")
    assertField("orders", "o_totalprice", _ == DoubleType, "double")
    assertField("orders", "o_orderdate", orderableDate,
      "date/timestamp (string-literal comparisons)")
    assertField("orders", "o_orderstatus", _ == StringType,
      "string (status filters)")
    assertField("orders", "o_orderpriority", _ == StringType,
      "string (priority group-bys)")
  }

  test("lineitem: keys integral, measures double, flags string, dates orderable") {
    assertField("lineitem", "l_orderkey", integral, "integral key")
    assertField("lineitem", "l_partkey", integral, "integral key")
    assertField("lineitem", "l_suppkey", integral, "integral key")
    assertField("lineitem", "l_linenumber", integral, "integral line number")
    assertField("lineitem", "l_quantity", _ == DoubleType, "double")
    assertField("lineitem", "l_extendedprice", _ == DoubleType, "double")
    assertField("lineitem", "l_discount", _ == DoubleType, "double")
    assertField("lineitem", "l_tax", _ == DoubleType, "double")
    assertField("lineitem", "l_returnflag", _ == StringType,
      "string (q1-shape group-bys)")
    assertField("lineitem", "l_linestatus", _ == StringType,
      "string (q1-shape group-bys)")
    assertField("lineitem", "l_shipdate", orderableDate,
      "date/timestamp (string-literal comparisons)")
  }

  test("region: key integral, name string") {
    assertField("region", "r_regionkey", integral, "integral key")
    assertField("region", "r_name", _ == StringType, "string (name equality)")
  }

  test("nation: keys integral, name string") {
    assertField("nation", "n_nationkey", integral, "integral key")
    assertField("nation", "n_regionkey", integral, "integral key")
    assertField("nation", "n_name", _ == StringType, "string (name equality)")
  }

  test("customer: keys integral, acctbal double, segment string") {
    assertField("customer", "c_custkey", integral, "integral key")
    assertField("customer", "c_nationkey", integral, "integral key")
    assertField("customer", "c_name", _ == StringType, "string")
    assertField("customer", "c_acctbal", _ == DoubleType,
      "double (balance arithmetic)")
    assertField("customer", "c_mktsegment", _ == StringType,
      "string (segment filters)")
  }

  test("supplier: keys integral, acctbal double") {
    assertField("supplier", "s_suppkey", integral, "integral key")
    assertField("supplier", "s_nationkey", integral, "integral key")
    assertField("supplier", "s_name", _ == StringType, "string")
    assertField("supplier", "s_acctbal", _ == DoubleType,
      "double (balance arithmetic)")
  }

  test("part: key integral, size integral, retailprice double, descriptors string") {
    assertField("part", "p_partkey", integral, "integral key")
    assertField("part", "p_size", integral, "integral size")
    assertField("part", "p_retailprice", _ == DoubleType, "double")
    assertField("part", "p_name", _ == StringType, "string (LIKE scans)")
    assertField("part", "p_brand", _ == StringType, "string (brand filters)")
    assertField("part", "p_type", _ == StringType, "string (type prefixes)")
  }

  test("documents: the text-pipeline columns") {
    assertField("documents", "doc_id", integral, "integral id")
    assertField("documents", "text", _ == StringType, "string")
    assertField("documents", "lang", _ == StringType, "string")
    assertField("documents", "source", _ == StringType, "string")
    assertField("documents", "n_chars", integral,
      "integral length (quality ratios)")
  }

  test("embeddings: the vector columns") {
    assertField("embeddings", "vec_id", integral, "integral id")
    assertField("embeddings", "embedding",
      { case ArrayType(FloatType, _) => true; case _ => false },
      "array<float>")
    assertField("embeddings", "label", integral, "integral label")
  }
}
