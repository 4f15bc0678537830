package graft.queries

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Iterative graph analytics over DataFrames — PageRank as the
  * representative: per iteration one edges⋈ranks join keyed by src and one
  * groupBy(dst), i.e. two narrow-key shuffles moving only (id, 8-byte
  * contribution) rows. At 100 TB the edge table is the big operand:
  * pre-partition (bucket) it by src so the per-iteration join reuses one
  * layout and only rank rows move; every k iterations localCheckpoint to
  * cut the growing lineage (3 fixed iterations here don't need it).
  *
  * EXACTNESS DISCIPLINE (what makes an iterative double computation
  * oracle-able at all): the per-edge contribution pr/outdeg is one IEEE
  * double expression, identical on any engine — but its per-node SUM is
  * engine-order-dependent. Each contribution is therefore floor-scaled to
  * an integer (×1e15) and summed as BIGINT — exact, commutative,
  * overflow-safe (total scaled mass ≈ 1e15 regardless of N since Σpr = 1)
  * — and the damping update runs on the descaled double with fixed
  * operation order. Result: bit-identical ranks on `local[4]`, a
  * 1000-executor cluster, and the DuckDB replay. The 1e-15 floor per edge
  * is a DEFINED part of the operator's semantics, not error.
  */
object GraphQueries {

  /** 3 fixed PageRank iterations, damping 0.85, uniform init; dangling
    * mass is dropped (the simplified variant — documented, mirrored by
    * the oracle).
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, n: Long,
      iters: Int = 3): DataFrame = {
    // Materialize the static operands ONCE and truncate each iteration's
    // lineage: without this, iteration i's plan re-derives edges + outdeg
    // from raw scans AND replays iterations 1..i-1 (the plan tree grows
    // multiplicatively — visible in `.explain` as the same Union/scan
    // subtree repeated per iteration). localCheckpoint stores the blocks
    // on the executors (no lineage), exactly the persist-the-graph /
    // checkpoint-the-ranks pattern an iterative job runs on a cluster;
    // the ContextCleaner reclaims blocks when the frames fall out of use.
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val ids = nodes.select(col("doc_id")).localCheckpoint()
    var pr = ids.select(col("doc_id"), lit(1.0 / n).as("pr"))
    (1 to iters).foreach { _ =>
      val sums = e
        .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          floor((col("pr") / col("outdeg")) * lit(1e15)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      pr = ids
        .join(sums.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("s"), lit(0L)).cast(DoubleType) / lit(1e15))).as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** The deterministic citation graph both engines derive identically:
    * doc d links to (31d+7, 17d+3, 13d+11) mod N, self-loops removed,
    * parallel edges collapsed.
    */
  def docGraph(docs: DataFrame, n: Long): DataFrame =
    Seq((31L, 7L), (17L, 3L), (13L, 11L))
      .map { case (a, b) =>
        docs.select(col("doc_id").as("src"),
          ((col("doc_id") * a + b) % n).as("dst"))
      }
      .reduce(_.unionAll(_))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** PageRank over the synthesized doc-citation graph. The graph size is
    * one metadata count (driver scalar — the only non-distributed value,
    * as in any PageRank init). The oracle unrolls the identical three
    * iterations relationally.
    */
  val q33Pagerank: QueryDef = QueryDef(
    "q33_pagerank",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      val n = docs.count()
      pagerank(docs, docGraph(docs, n), n).orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id FROM documents),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
      e AS (SELECT DISTINCT src, dst FROM (
              SELECT doc_id AS src, (doc_id*31+7) % (SELECT n FROM nn) AS dst FROM d
              UNION ALL
              SELECT doc_id, (doc_id*17+3) % (SELECT n FROM nn) FROM d
              UNION ALL
              SELECT doc_id, (doc_id*13+11) % (SELECT n FROM nn) FROM d)
            WHERE src <> dst),
      od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
      p0 AS (SELECT doc_id, 1.0 / CAST((SELECT n FROM nn) AS DOUBLE) AS pr FROM d),
      s1 AS (SELECT e.dst, CAST(SUM(CAST(FLOOR((p.pr / od.outdeg) * 1e15) AS BIGINT)) AS BIGINT) AS s
             FROM e JOIN p0 p ON p.doc_id = e.src JOIN od ON od.src = e.src
             GROUP BY e.dst),
      p1 AS (SELECT d.doc_id,
                    0.15 / CAST((SELECT n FROM nn) AS DOUBLE)
                      + 0.85 * (CAST(COALESCE(s1.s, 0) AS DOUBLE) / 1e15) AS pr
             FROM d LEFT JOIN s1 ON s1.dst = d.doc_id),
      s2 AS (SELECT e.dst, CAST(SUM(CAST(FLOOR((p.pr / od.outdeg) * 1e15) AS BIGINT)) AS BIGINT) AS s
             FROM e JOIN p1 p ON p.doc_id = e.src JOIN od ON od.src = e.src
             GROUP BY e.dst),
      p2 AS (SELECT d.doc_id,
                    0.15 / CAST((SELECT n FROM nn) AS DOUBLE)
                      + 0.85 * (CAST(COALESCE(s2.s, 0) AS DOUBLE) / 1e15) AS pr
             FROM d LEFT JOIN s2 ON s2.dst = d.doc_id),
      s3 AS (SELECT e.dst, CAST(SUM(CAST(FLOOR((p.pr / od.outdeg) * 1e15) AS BIGINT)) AS BIGINT) AS s
             FROM e JOIN p2 p ON p.doc_id = e.src JOIN od ON od.src = e.src
             GROUP BY e.dst),
      p3 AS (SELECT d.doc_id,
                    0.15 / CAST((SELECT n FROM nn) AS DOUBLE)
                      + 0.85 * (CAST(COALESCE(s3.s, 0) AS DOUBLE) / 1e15) AS pr
             FROM d LEFT JOIN s3 ON s3.dst = d.doc_id)
      SELECT doc_id, pr FROM p3 ORDER BY doc_id""")
  )

  /** Hierarchy flattening by POINTER DOUBLING — resolve every node's
    * root ancestor and depth in O(log depth) rounds instead of
    * depth-many: each round joins the (node → 2^i-step ancestor,
    * distance) table with itself, squaring the hop length. This is the
    * third iteration regime next to d8 (iterate-to-convergence) and q33
    * (fixed damped iterations), and the one that makes deep chains
    * tractable at scale — a depth-1e6 lineage resolves in 20 keyed
    * shuffles of (id, id, long) rows. All integers; the oracle walks the
    * same tree with a recursive CTE.
    *
    * The hierarchy: user k reports to k div 2, root 1 (a deterministic
    * binary org tree both engines derive identically).
    *
    * Doubling iterates over the ancestor CLOSURE of the user set, not the
    * user set alone: the `anc = k2` self-join resolves every hop against
    * the node table, so an ancestor id that happens not to be a user
    * itself must still appear as a node or its users silently drop (the
    * oracle walks cur div 2 unconditionally and keeps them). Closure
    * generation is a bounded 32-way fan-out per user (shiftright by each
    * bit position — exactly the div-2 ancestor chain) + one distinct; the
    * output then restricts back to user nodes. Correctness no longer
    * assumes contiguous user ids.
    */
  val q39Hierarchy: QueryDef = QueryDef(
    "q39_hierarchy",
    (s, dir) => {
      // node id = user_id + 1 so ids start at the root 1 (user ids are
      // 0-based; 0 div 2 = 0 would self-loop outside the tree)
      val users = Tables.load(s, dir, "events")
        .select((col("user_id") + 1).as("node")).distinct()
      val nodes = users
        .select(explode(expr("sequence(0, 31)")).as("i"), col("node"))
        .select(expr("shiftright(node, i)").as("node"))
        .filter(col("node") >= 1)
        .distinct()
      // (k, anc, d): anc is k's d-step ancestor; root 1 self-loops at d=0
      var cur = nodes.select(col("node").as("k"),
        when(col("node") === 1, lit(1L)).otherwise(expr("node div 2")).as("anc"),
        when(col("node") === 1, lit(0L)).otherwise(lit(1L)).as("d"))
        .localCheckpoint()
      val rounds = 5 // covers depth <= 2^5 = 32; user ids at any sf stay far below 2^32
      (1 to rounds).foreach { _ =>
        val hop = cur.select(col("k").as("k2"), col("anc").as("anc2"), col("d").as("d2"))
        cur = cur.join(hop, col("anc") === col("k2"))
          .select(col("k"), col("anc2").as("anc"), (col("d") + col("d2")).as("d"))
          .localCheckpoint()
      }
      cur.join(users.select(col("node").as("k")), Seq("k"))
        .select((col("k") - 1).as("user_id"), col("anc").as("root"),
          col("d").as("depth"))
        .orderBy("user_id")
    },
    Some("""
      WITH RECURSIVE walk(k, cur, d) AS (
        SELECT user_id + 1, user_id + 1, 0
        FROM (SELECT DISTINCT user_id FROM events)
        UNION ALL
        SELECT k, cur // 2, d + 1 FROM walk WHERE cur > 1)
      SELECT k - 1 AS user_id, CAST(1 AS BIGINT) AS root, CAST(d AS BIGINT) AS depth
      FROM walk WHERE cur = 1 ORDER BY user_id""")
  )

  /** BFS reachability LEVELS from the lowest doc id — the third
    * iteration regime in the graph family: FRONTIER expansion (q33
    * iterates a fixed damped recurrence over all nodes; q39
    * pointer-doubles; BFS touches only the wave). Each of the 4 rounds
    * is one edges⋈frontier join keyed by src plus an anti-join against
    * the visited set — at scale both are narrow-key shuffles sized by
    * the FRONTIER, not the graph, and `localCheckpoint` caps lineage
    * exactly as in pagerank. First-discovery level ≡ shortest distance;
    * nodes beyond radius 4 report level −1. The oracle replays the same
    * radius-bounded search with a recursive CTE (UNION-distinct states,
    * MIN(lvl) per node — identical shortest-≤4 semantics).
    */
  val q52BfsLevels: QueryDef = QueryDef(
    "q52_bfs_levels",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      val n = docs.count()
      if (n == 0) {
        // an empty corpus has no source node: min(doc_id) is NULL and
        // getLong NPE'd — a BFS over zero nodes is zero rows, not a crash
        s.range(0).select(lit(-1).as("lvl"), lit(0L).as("n_nodes"))
      } else {
      val src0 = docs.agg(min("doc_id")).head().getLong(0)
      val e = docGraph(docs, n).localCheckpoint()
      var dist = docs.filter(col("doc_id") === src0)
        .select(col("doc_id").as("id"), lit(0).as("lvl")).localCheckpoint()
      var frontier = dist
      (1 to 4).foreach { k =>
        val reached = e
          .join(frontier.select(col("id").as("src")), Seq("src"))
          .select(col("dst").as("id")).distinct()
        val fresh = reached.join(dist.select("id"), Seq("id"), "left_anti")
          .select(col("id"), lit(k).as("lvl")).localCheckpoint()
        dist = dist.unionAll(fresh).localCheckpoint()
        frontier = fresh
      }
      dist.agg((lit(n) - count(lit(1))).as("n_nodes"))
        .select(lit(-1).as("lvl"), col("n_nodes"))
        .unionByName(
          dist.groupBy("lvl").agg(count(lit(1)).as("n_nodes")))
        .orderBy("lvl")
      }
    },
    Some("""
      WITH RECURSIVE
      d AS (SELECT doc_id FROM documents),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS src0
             FROM d),
      e AS (SELECT DISTINCT src, dst FROM (
              SELECT doc_id AS src,
                     (doc_id*31+7) % (SELECT n FROM nn) AS dst FROM d
              UNION ALL
              SELECT doc_id, (doc_id*17+3) % (SELECT n FROM nn) FROM d
              UNION ALL
              SELECT doc_id, (doc_id*13+11) % (SELECT n FROM nn) FROM d)
            WHERE src <> dst),
      walk(id, lvl) AS (
        SELECT src0, 0 FROM nn
        UNION
        SELECT e.dst, walk.lvl + 1 FROM walk JOIN e ON e.src = walk.id
        WHERE walk.lvl < 4),
      dist AS (SELECT id, MIN(lvl) AS lvl FROM walk GROUP BY id)
      SELECT CAST(lvl AS INTEGER) AS lvl, COUNT(*) AS n_nodes
      FROM dist GROUP BY lvl
      UNION ALL
      SELECT -1, (SELECT n FROM nn) - (SELECT COUNT(*) FROM dist)
      ORDER BY lvl""")
  )

  val all: Seq[QueryDef] = Seq(q33Pagerank, q39Hierarchy, q52BfsLevels)
}
