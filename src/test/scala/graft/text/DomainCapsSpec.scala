package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t25 per-domain quotas: the bounded-heap selection must equal the
  * window formulation, actually clip (non-vacuous cap), and keep the
  * smallest ids per domain.
  */
class DomainCapsSpec extends SparkSpec {

  test("heap selection equals the window formulation; cap is non-vacuous") {
    val got = TextQueries.t25DomainCaps.fn(spark, sf)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1)))

    // never more than k per domain, and the cap clips at least one domain
    val perDomain = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perDomain.values.forall(_ <= 3))

    // independent window reference over the same synthesized domains
    val tld = element_at(array(lit("com"), lit("org"), lit("net")),
      (col("doc_id") % 3 + 1).cast("int"))
    val url = concat(lit("https://www.site"), col("doc_id") % 37,
      lit("."), tld, lit("/p/"), col("doc_id"))
    val host = regexp_extract(col("url"), "^https?://([^/]+)/", 1)
    val base = graft.core.Tables.load(spark, sf, "documents")
      .withColumn("url", url)
      .withColumn("domain", regexp_replace(host, "^www\\.", ""))
    val want = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("domain").orderBy("doc_id")))
      .filter(col("rn") <= 3)
      .select("domain", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSet == want.toSet)

    val totalDocs = base.count()
    assert(rows.length < totalDocs, "cap never clipped — vacuous test data")
  }
}
