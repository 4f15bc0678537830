package graft.pipelines

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The corpus-ingest pipeline REGISTERED end to end (p1): not another
  * operator, but the composition a user actually runs — PII scrub →
  * quality gate → within-batch first-wins dedup → ledger anti-join →
  * partitioned append — replayed over two deterministic batches
  * (even doc_ids, then odd doc_ids plus RE-SENDS of every 10th doc,
  * which the ledger must screen out). The DuckDB oracle recomputes the
  * whole composition relationally: t15's scrub patterns, t2's quality
  * shape on the scrubbed text, window-rank first-wins, and a NOT-IN
  * ledger screen — so the assembled pipeline (not just its stages) is
  * value-verified, including the batch-partitioned table state.
  */
object PipelineQueries {

  private val p1Cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def augmented(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.loadSpread(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" reach me at user"), col("doc_id"), lit("@example.com now")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" server 10.0."), col("doc_id") % 256, lit(".25 logged")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" call 555-867-5309 today"))
            .otherwise(lit(""))).as("content"))

  private def corpusDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    p1Cache.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-p1").toString
      val corpus = s"$tmp/corpus"
      val ledger = s"$tmp/ledger"
      val aug = augmented(s, dir)
      val batch0 = aug.filter(col("doc_id") % 2 === 0)
        .select(concat(lit("docs/"), col("doc_id"), lit(".txt")).as("path"),
          col("content"))
      CorpusIngestPipeline.processBatch(s, batch0, corpus, ledger,
        batchId = 0L, minQuality = 0.2)
      val batch1 = aug.filter(col("doc_id") % 2 === 1)
        .select(concat(lit("docs/"), col("doc_id"), lit(".txt")).as("path"),
          col("content"))
        .unionByName(aug.filter(col("doc_id") % 10 === 0)
          .select(concat(lit("resend/"), col("doc_id"), lit(".txt")).as("path"),
            col("content")))
      CorpusIngestPipeline.processBatch(s, batch1, corpus, ledger,
        batchId = 1L, minQuality = 0.2)
      corpus
    })

  val p1CorpusIngest: QueryDef = QueryDef(
    "p1_corpus_ingest",
    (s, dir) =>
      s.read.parquet(corpusDir(s, dir))
        .select(col("content_key"), col("path"), col("quality"),
          col("batch_id").cast("long").as("batch_id"))
        .orderBy("content_key"),
    Some("""
      WITH a AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' reach me at user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' server 10.0.' || (doc_id % 256) || '.25 logged'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-867-5309 today' ELSE '' END AS content
        FROM documents),
      c AS (
        SELECT doc_id,
               REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(content,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
        FROM a),
      q AS (
        SELECT doc_id, sha256(clean) AS content_key,
               LEAST(1.0, CAST(LENGTH(clean) - LENGTH(REPLACE(clean, ' ', '')) + 1 AS DOUBLE) / 64.0)
                 * (1.0 - CAST(LENGTH(REGEXP_REPLACE(clean, '[^.,!?;:]', '', 'g')) AS DOUBLE) / LENGTH(clean))
                 * CASE WHEN CAST(LENGTH(LIST_FILTER(STRING_SPLIT(clean, ' '),
                               x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS DOUBLE)
                            / (LENGTH(clean) - LENGTH(REPLACE(clean, ' ', '')) + 1) > 0.05
                         AND CAST(LENGTH(LIST_FILTER(STRING_SPLIT(clean, ' '),
                               x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS DOUBLE)
                            / (LENGTH(clean) - LENGTH(REPLACE(clean, ' ', '')) + 1) < 0.5
                       THEN 1.0 ELSE 0.5 END AS quality
        FROM c),
      b0 AS (
        SELECT content_key, 'docs/' || doc_id || '.txt' AS path, quality,
               ROW_NUMBER() OVER (PARTITION BY content_key
                                  ORDER BY 'docs/' || doc_id || '.txt') AS rn
        FROM q WHERE doc_id % 2 = 0 AND quality >= 0.2),
      acc0 AS (SELECT content_key, path, quality FROM b0 WHERE rn = 1),
      b1src AS (
        SELECT content_key, 'docs/' || doc_id || '.txt' AS path, quality
        FROM q WHERE doc_id % 2 = 1 AND quality >= 0.2
        UNION ALL
        SELECT content_key, 'resend/' || doc_id || '.txt' AS path, quality
        FROM q WHERE doc_id % 10 = 0 AND quality >= 0.2),
      b1 AS (
        SELECT content_key, path, quality,
               ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY path) AS rn
        FROM b1src
        WHERE content_key NOT IN (SELECT content_key FROM acc0)),
      acc1 AS (SELECT content_key, path, quality FROM b1 WHERE rn = 1)
      SELECT content_key, path, quality, CAST(0 AS BIGINT) AS batch_id FROM acc0
      UNION ALL
      SELECT content_key, path, quality, CAST(1 AS BIGINT) AS batch_id FROM acc1
      ORDER BY content_key""")
  )

  val all: Seq[QueryDef] = Seq(p1CorpusIngest)
}
