package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's QueryDef; the driver verifies
  * each against its DuckDB oracle (when present) at sf0.01 and benches at
  * sf0.1.
  */
object SparkEntry {

  /** All registered capabilities, in registration order. */
  def defs: Seq[QueryDef] =
    RelationalQueries.all ++ JoinQueries.all ++ EventQueries.all ++
      GraphQueries.all ++
      graft.flows.FlowQueries.all ++ graft.catalog.CatalogQueries.all ++
      graft.signals.SignalQueries.all ++
      graft.text.TextQueries.all ++ graft.dedup.DedupQueries.all ++
      graft.sim.SimilarityQueries.all ++ graft.multimodal.MultimodalQueries.all ++
      graft.stream.StreamQueries.all ++ graft.pipelines.PipelineQueries.all ++
      graft.layout.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * SQL may reference auxiliary dumps (see [[QueryDef.aux]]) through the
    * `{OUT}` placeholder, which [[Verify]] replaces with its output dir.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Auxiliary per-query dumps for oracle verification, keyed
    * `<query>__<aux>` (written to `<out>/aux/<key>` by [[Verify]]).
    */
  def auxDumps: Map[String, (SparkSession, String) => DataFrame] =
    defs.flatMap(d => d.aux.map { case (k, f) => s"${d.name}__$k" -> f }).toMap
}
