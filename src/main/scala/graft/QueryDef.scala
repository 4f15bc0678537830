package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a named DataFrame query over a
  * scale-factor directory plus (when SQL-expressible) the equivalent DuckDB
  * oracle SQL. The driver hash-compares results, so every query must be
  * fully deterministic: explicit ORDER BY on a unique key in both sides,
  * identical column names, order-independent double aggregation
  * (see [[graft.core.Exact]]).
  *
  * `aux` dumps let an oracle verify queries whose inner hash/bucket
  * primitives have no DuckDB analog (xxhash64, hyperplane LSH, trained
  * centroids): the Spark side dumps the per-row primitive output
  * (signatures, bucket ids, cell assignments) to
  * `<out>/aux/<query>__<key>`, and the oracle SQL — which may reference
  * those files via the `{OUT}` placeholder, substituted by [[Verify]] —
  * brute-force recomputes the *pair/top-k property* over them. The
  * LSH/index shortcut is thereby checked against the exhaustive answer;
  * the primitives themselves are pinned by ScalaTest specs.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    aux: Map[String, (SparkSession, String) => DataFrame] = Map.empty)
