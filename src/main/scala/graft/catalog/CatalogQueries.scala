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

  /** Catalog SEARCH over assembled DataCite documents — the reference's
    * Globus-Search consumer side: build the nested doc per file
    * ([[Catalog.dataciteDoc]] — struct composition, no UDF), then filter
    * on projected nested fields (mime format, payload length, title
    * keyword) exactly like a faceted search. The oracle recomputes the
    * derived fields relationally, so the nested-struct projection path
    * (`dc.titles[0].title`, `files[0].length`, …) is value-verified.
    */
  val c2CatalogSearch: QueryDef = QueryDef(
    "c2_catalog_search",
    (s, dir) => {
      val files = Tables.loadSpread(s, dir, "documents")
        .select(concat(lit("docs/"), col("source"), lit("/"),
          col("doc_id"), lit(".txt")).as("path"),
          col("text").as("content"),
          lit("{}").as("metadata_json"))
      Catalog.dataciteDoc(files)
        .select(col("subject"),
          col("dc").getField("titles").getItem(0).getField("title").as("title"),
          col("files").getItem(0).getField("length").as("len"),
          col("files").getItem(0).getField("sha256").as("sha256"),
          col("files").getItem(0).getField("mime_type").as("mime_type"))
        .filter(col("mime_type") === "text/plain" &&
          col("len") > 200 && col("title").like("%7%"))
        .orderBy("subject")
    },
    Some("""
      SELECT subject, title, len, sha256, mime_type FROM (
        SELECT 'globus://docs/' || source || '/' || doc_id || '.txt' AS subject,
               doc_id || '.txt' AS title,
               CAST(LENGTH(text) AS BIGINT) AS len,
               sha256(text) AS sha256,
               'text/plain' AS mime_type
        FROM documents)
      WHERE len > 200 AND title LIKE '%7%'
      ORDER BY subject""")
  )

  val all: Seq[QueryDef] = Seq(c1Checksums, c2CatalogSearch)
}
