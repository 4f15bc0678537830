package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a named DataFrame query over a
  * scale-factor directory plus (when SQL-expressible) the equivalent DuckDB
  * oracle SQL. The driver hash-compares results, so every query must be
  * fully deterministic: explicit ORDER BY on a unique key in both sides,
  * identical column names, order-independent double aggregation
  * (see [[graft.core.Exact]]).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
