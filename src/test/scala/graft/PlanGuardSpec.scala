package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter, GlobalLimit, Join => LJoin, LocalLimit, LogicalPlan, BROADCAST}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The 100 TB plan audit as a regression gate: every registered query is
  * swept for the three anti-patterns that turn a working sf0.1 query into
  * a cluster-killer at scale:
  *
  *   1. CartesianProduct — O(|L|·|R|) pairs; never acceptable against an
  *      unbounded side. Checked on the static physical plan.
  *   2. FORCED broadcast of an unbounded side — a `broadcast()` hint over
  *      a subtree whose cardinality grows with the data: a grouped
  *      aggregate of a fact table (the q60 class of bug fixed in round
  *      4), or an unfiltered fact scan. Hints live in the OPTIMIZED
  *      LOGICAL plan's JoinHint — that is what distinguishes a committed
  *      decision from a stats-driven one: the planner's own broadcast
  *      choices re-derive from size estimates and flip to shuffle joins
  *      as the data grows, so they are scale-adaptive by construction
  *      and NOT flagged.
  *   3. A global Sort anywhere but the final presentation ORDER BY — a
  *      mid-plan global sort range-shuffles the whole intermediate
  *      result; bounded top-k must plan as TakeOrderedAndProject and
  *      windows must partition. Checked on the static physical plan.
  *
  * Plus 1b: a BroadcastNestedLoopJoin (however chosen — non-equi joins
  * have no shuffle fallback, so even the stats-driven pick is a
  * commitment) whose build side carries no structural cardinality bound.
  *
  * Any deliberate exception must be registered in [[justified]] with the
  * scale argument that makes it safe — a new query tripping the sweep
  * fails CI until its plan is fixed or argued.
  */
class PlanGuardSpec extends SparkSpec {

  /** Fact tables: cardinality grows linearly (or worse) with scale.
    * region/nation/supplier/part/customer are dimensions here — the first
    * two fixed, the rest small multiples of SF that AQE handles.
    */
  private val factTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  // -- physical-plan helpers -------------------------------------------------

  /** Every physical node in `p`, descending into PHYSICAL subquery plans
    * only. (At the static-sparkPlan stage subquery expressions may still
    * hold logical plans — `collectWithSubqueries` would traverse those as
    * if physical and ClassCastException.)
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    val subPlans = here
      .flatMap(_.expressions.flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          pe.plan
      }))
      .collect { case sp: SparkPlan => sp }
    here ++ subPlans.flatMap(nodes)
  }

  // -- logical-plan helpers --------------------------------------------------

  private def lFactScans(p: LogicalPlan): Seq[String] =
    p.collect {
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation =>
            factTables.filter(t => fs.location.rootPaths
              .exists(_.toString.contains(s"/$t.parquet")))
          case _ => Nil
        }
    }.flatten.distinct

  /** A logical subtree is cardinality-bounded when the optimizer can put
    * a number on it (limits, scalar aggregates — `maxRows`), regardless
    * of how much data sits below.
    */
  private def lBounded(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1000000L) ||
      p.collect {
        case a: Aggregate if a.groupingExpressions.isEmpty => a
        case l: GlobalLimit => l
        case l: LocalLimit => l
      }.nonEmpty

  /** Queries whose flagged pattern is scale-safe for a stated reason —
    * keyed by query name, valued by (violation-prefix it excuses, the
    * scale argument) pairs. Suppression is per-category: a justified
    * query growing a DIFFERENT anti-pattern still fails.
    *
    * Two recurring arguments:
    *   - "query batch": the broadcast side is a literally-filtered set
    *     of query/probe rows — constant in corpus size by construction.
    *   - "domain-bounded aggregate": the broadcast side is a grouped
    *     aggregate whose KEY DOMAIN is fixed by schema or calendar
    *     (returnflag=3, event_type=5, step names, channel index ≤ 4096,
    *     source labels, hour/day buckets), so its row count does not
    *     grow with data volume — and the forced hint is DELIBERATE:
    *     planner size estimates for aggregates are unreliable, while
    *     the domain bound is exact knowledge the optimizer lacks.
    */
  private val justified: Map[String, Seq[(String, String)]] = Map(
    "s1_ann_topk" -> Seq("nested-loop join" ->
      ("broadcast side is the QUERY BATCH (literal filter on the unique " +
        "vec_id): constant in corpus size — the canonical serving shape; " +
        "the corpus streams exactly once")),
    "s4_range_search" -> Seq("nested-loop join" -> "s1 rationale (query batch)"),
    "s5_ann_quantized" -> Seq("nested-loop join" -> "s1 rationale (query batch)"),
    "s6_hard_negatives" -> Seq("nested-loop join" -> "s1 rationale (query batch)"),
    "s7_ann_rerank" -> Seq("nested-loop join" -> "s1 rationale (query batch)"),
    "t11_sketch_overlap" -> Seq("nested-loop join" ->
      ("all-pairs over per-SOURCE sketch aggregates: source is a fixed " +
        "label domain (~20 values) like event_type, not data-scaled; the " +
        "document-scaled all-pairs problem is served by d2/d4's banded LSH")),
    "t12_sketch_difference" -> Seq("nested-loop join" -> "t11 rationale"),
    "t30_vocab_growth" -> Seq(
      "nested-loop join" ->
        ("triangular join over per-BLOCK corpus summaries; block width is " +
          "the sizing parameter (64 docs at test SF) chosen so the block " +
          "axis stays ~1e3 rows at any corpus size"),
      "forced broadcast" -> "same per-block summary side"),
    "q41_winsorized" -> Seq("forced broadcast" ->
      "band = one (p05,p95) row per l_returnflag — 3-value schema domain"),
    "q57_mad_anomaly" -> Seq("forced broadcast" ->
      "median/MAD rows per event_type — 5-value schema domain"),
    "f7_runtime_outliers" -> Seq("forced broadcast" ->
      "per-step stats — the step-name domain is the pipeline definition"),
    "q49_concurrency" -> Seq("forced broadcast" ->
      "per-hour boundary offsets — calendar domain (rows ∝ hours, not data)"),
    "q40_retention" -> Seq("forced broadcast" ->
      "cohort sizes per first-activity DAY — calendar domain"),
    "g4_peak_detect" -> Seq("forced broadcast" ->
      ("aggregated series rows per channel — channel index is the signal " +
        "layout (≤ 4096), a schema bound")),
    "g6_background" -> Seq("forced broadcast" -> "g4 rationale (per-channel)"),
    "g7_xcorr" -> Seq("forced broadcast" -> "g4 rationale (per-channel)"),
    "t14_mixture_sample" -> Seq("forced broadcast" ->
      "per-source token totals — fixed source-label domain"),
    "d9_incremental_dedup" -> Seq("forced broadcast" ->
      ("both broadcasts are bounded by the BATCH-increment key set (the " +
        "matched side is a semi-join against it); the corpus-lifetime " +
        "ledger side never shuffles nor broadcasts — that asymmetry is " +
        "the antiJoinSmallLeft contract")),
  )

  private def check(name: String, qe: QueryExecution): Seq[String] = {
    val out = Seq.newBuilder[String]
    val plan = qe.sparkPlan
    val all = nodes(plan)

    // R1: cartesian products
    if (all.exists(_.isInstanceOf[CartesianProductExec]))
      out += s"CartesianProduct in $name"

    // R1b: nested-loop joins may only broadcast a side with a structural
    // cardinality bound (scalar aggregate, limit, literal range/values)
    all.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
      val build = b.buildSide match {
        case BuildLeft => b.left
        case BuildRight => b.right
      }
      val bounded = nodes(build).exists {
        case a: BaseAggregateExec => a.groupingExpressions.isEmpty
        case _: GlobalLimitExec | _: LocalLimitExec |
            _: TakeOrderedAndProjectExec | _: LocalTableScanExec |
            _: RDDScanExec | _: RangeExec => true
        case _ => false
      }
      if (!bounded)
        out += s"nested-loop join over a side with no cardinality bound in $name"
    }

    // R2: HINT-forced broadcast of an unbounded fact-derived side
    qe.optimizedPlan.collectWithSubqueries { case j: LJoin => j }.foreach { j =>
      val hintedSides =
        (if (j.hint.leftHint.exists(_.strategy.contains(BROADCAST))) Seq(j.left)
         else Nil) ++
          (if (j.hint.rightHint.exists(_.strategy.contains(BROADCAST))) Seq(j.right)
           else Nil)
      hintedSides.foreach { side =>
        val facts = lFactScans(side)
        if (facts.nonEmpty && !lBounded(side)) {
          val groupedAgg = side.collect {
            case a: Aggregate if a.groupingExpressions.nonEmpty => a
          }
          val hasFilter = side.collect { case f: LFilter => f }
          if (groupedAgg.nonEmpty)
            out += s"forced broadcast of a grouped aggregate over fact ${facts.mkString(",")} in $name"
          else if (hasFilter.isEmpty)
            out += s"forced broadcast of an unfiltered fact scan (${facts.mkString(",")}) in $name"
        }
      }
    }

    // R3: global sorts anywhere but the final presentation ORDER BY
    def walk(p: SparkPlan, finalPath: Boolean): Unit = p match {
      case s: SortExec if s.global =>
        if (!finalPath) out += s"mid-plan global Sort in $name"
        s.children.foreach(walk(_, finalPath = false))
      case other =>
        val stillFinal = finalPath && (other match {
          case _: ProjectExec | _: WholeStageCodegenExec | _: InputAdapter |
              _: ColumnarToRowExec | _: CollectLimitExec | _: GlobalLimitExec |
              _: LocalLimitExec | _: SerializeFromObjectExec |
              _: DeserializeToObjectExec => true
          case _ => false
        })
        other.children.foreach(walk(_, stillFinal))
    }
    walk(plan, finalPath = true)

    out.result().distinct
  }

  test("every registered query plan is free of scale anti-patterns") {
    val violations = SparkEntry.defs.flatMap { d =>
      val qe = d.fn(spark, sf).queryExecution
      check(d.name, qe).filterNot(v =>
        justified.getOrElse(d.name, Nil)
          .exists { case (prefix, _) => v.startsWith(prefix) })
    }
    assert(violations.isEmpty,
      s"${violations.size} plan violations:\n${violations.mkString("\n")}")
  }

  test("justifications only name registered queries (no stale entries)") {
    val names = SparkEntry.defs.map(_.name).toSet
    val stale = justified.keys.filterNot(names)
    assert(stale.isEmpty, s"stale justification entries: ${stale.mkString(", ")}")
  }
}
