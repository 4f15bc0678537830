package graft.catalog

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked catalog operators over the harness `documents` table
  * (SURVEY §2 A10 checksums/length/mime + F crypto functions).
  */
object CatalogQueries {

  /** File-metadata derivation: deterministic synthetic filename per doc,
    * then length, sha256, md5 and the extension→MIME lookup — everything
    * DuckDB can recompute. sha512 has no DuckDB builtin, so it is covered
    * by CatalogSpec instead.
    */
  val c1Checksums: QueryDef = QueryDef(
    "c1_checksums",
    (s, dir) =>
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("source"), lit("/doc_"), col("doc_id"),
            element_at(array(lit(".txt"), lit(".json"), lit(".emd"), lit(".xyz")),
              (col("doc_id") % 4 + 1).cast("int"))).as("filename"),
          col("text"))
        .select(col("doc_id"), col("filename"),
          length(col("text")).cast("long").as("len"),
          sha2(col("text"), 256).as("sha256"),
          md5(col("text")).as("md5"),
          Catalog.mimeOf(col("filename")).as("mime_type"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
        source || '/doc_' || doc_id ||
          (['.txt', '.json', '.emd', '.xyz'])[CAST(doc_id % 4 + 1 AS INTEGER)] AS filename,
        CAST(LENGTH(text) AS BIGINT) AS len,
        sha256(text) AS sha256,
        md5(text) AS md5,
        CASE lower(regexp_extract(source || '/doc_' || doc_id ||
            (['.txt', '.json', '.emd', '.xyz'])[CAST(doc_id % 4 + 1 AS INTEGER)],
            '\.([^./]+)$', 1))
          WHEN 'txt' THEN 'text/plain'
          WHEN 'json' THEN 'application/json'
          WHEN 'emd' THEN 'application/x-hdf5'
          ELSE 'application/octet-stream' END AS mime_type
      FROM documents ORDER BY doc_id""")
  )

  val all: Seq[QueryDef] = Seq(c1Checksums)
}
