package graft.sim

import graft.QueryDef
import graft.core.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table.
  *
  * s1 is the exact baseline: broadcast the (small) query set against the
  * corpus — one corpus scan, no shuffle of the corpus, per-partition
  * top-k via window. s2 is the scale path: hyperplane-LSH bucketing turns
  * ANN into a bucket-local join (corpus shuffled once by bucket id, query
  * fan-out only to matching buckets).
  */
object SimilarityQueries {

  /** Exact brute-force cosine top-10 for query vectors (vec_id < 10).
    * Bit-exact double cosine on both engines → full oracle compare
    * including similarity values.
    */
  val s1AnnBruteForce: QueryDef = QueryDef(
    "s1_ann_topk",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosineFast(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    },
    Some("""
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                                                  CAST(e.embedding AS DOUBLE[])) DESC,
                                           e.vec_id) AS rank
        FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id != q.vec_id)
      WHERE rank <= 10 ORDER BY query_id, rank""")
  )

  /** LSH-bucketed ANN: 8-bit hyperplane signature partitions the corpus;
    * each query searches only its own bucket. Recall vs the exact answer
    * is spec-tested against s1; the DuckDB oracle recomputes the SAME
    * bucket-restricted top-k exhaustively from the aux-dumped bucket
    * assignments (the hyperplane signature has no DuckDB analog), so the
    * bucket-join + window plan is value-verified end to end.
    */
  val s2AnnLsh: QueryDef = QueryDef(
    "s2_ann_lsh",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val bucketed = e.select(
        col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), nBits = 8, dim = 64).as("bucket"))
      val q = broadcast(
        bucketed.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("bucket").as("qbucket")))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      bucketed
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("bucket"))
        .join(q, col("bucket") === col("qbucket") && col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosineFast(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH b AS (SELECT * FROM read_parquet('{OUT}/aux/s2_ann_lsh__buckets/*.parquet')),
      cand AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
        FROM b q JOIN b e ON q.bucket = e.bucket AND e.vec_id <> q.vec_id
        WHERE q.vec_id < 10),
      scored AS (
        SELECT c.query_id, c.neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])) AS cos
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 10 ORDER BY query_id, rank"""),
    aux = Map("buckets" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          hyperplaneBucket(col("embedding"), nBits = 8, dim = 64).as("bucket"))
        .orderBy("vec_id")))
  )

  /** IVF-probe ANN: deterministic k=16-cell index, 3-probe search. The
    * other scale path next to s2's hyperplane LSH — at 100 TB the corpus
    * is partitioned by cell and each probe prunes to nprobe/k of the data.
    * Recall is spec-tested vs s1; the DuckDB oracle recomputes the same
    * probed-cell top-k exhaustively from the aux-dumped cell assignments
    * and probe lists (training is deterministic — graft.sim.Ivf — so the
    * aux dumps reproduce the query's own index bit-for-bit).
    *
    * Build and search are separated ([[Ivf.trainCached]]): the index is
    * built once per corpus and reused by the query and both aux dumps —
    * the real build-once / search-many lifecycle, and the benchmark's
    * steady-state passes measure search, not repeated training.
    */
  val s3AnnIvf: QueryDef = QueryDef(
    "s3_ann_ivf",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.search(e, queries, model, k = 16, nprobe = 3, topK = 10)
    },
    Some("""
      WITH cells AS (SELECT * FROM read_parquet('{OUT}/aux/s3_ann_ivf__cells/*.parquet')),
      probes AS (SELECT * FROM read_parquet('{OUT}/aux/s3_ann_ivf__probes/*.parquet')),
      cand AS (
        SELECT p.query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN cells c ON p.cell = c.cell AND c.vec_id <> p.query_id),
      scored AS (
        SELECT c.query_id, c.neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])) AS cos
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 10 ORDER BY query_id, rank"""),
    aux = Map(
      "cells" -> ((s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
        e.select(col("vec_id"),
          graft.expressions.GraftExpressions.ivfCell(col("embedding"), model, 16).as("cell"))
          .orderBy("vec_id")
      }),
      "probes" -> ((s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            explode(graft.expressions.GraftExpressions.ivfProbeCells(
              col("embedding"), model, 16, 3)).as("cell"))
          .orderBy("query_id", "cell")
      }))
  )

  /** Similarity RANGE search: every corpus vector within cosine ≥ 0.3 of
    * each query vector — the radius-query counterpart of s1's top-k.
    *
    * Regime choice, deliberately: for a SMALL query set the scale-optimal
    * plan is the broadcast scan (queries broadcast, ONE corpus pass, zero
    * shuffle — at 100 TB the corpus never moves); LSH bucketing only wins
    * for self-joins or large query sets, and that regime is covered by
    * d5's banded plan. On this data an LSH range join could not be exact
    * at θ=0.3 anyway (p=0.6/bit ⇒ completeness needs impractically many
    * bands), and approximate results would fail the value oracle.
    */
  val s4RangeSearch: QueryDef = QueryDef(
    "s4_range_search",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosineFast(col("qv"), col("nv")))
        .filter(col("cos") >= 0.3)
        .select("query_id", "neighbor_id", "cos")
        .orderBy("query_id", "neighbor_id")
    },
    Some("""
      SELECT query_id, neighbor_id, cos FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos
        FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id != q.vec_id)
      WHERE cos >= 0.3 ORDER BY query_id, neighbor_id""")
  )

  /** Quantized ANN ([[graft.expressions.Quant]]): the corpus ranks by
    * int8 dot product × the two per-vector scales — a 4× smaller resident
    * corpus and an integer inner loop, the standard serving trade against
    * f32 exactness (recall vs s1 is spec-measured). The ranking is fully
    * deterministic and the integer dot is exactly representable in a
    * double, so the oracle replays the SAME quantized ranking from the
    * aux-dumped (id, int values, scale) rows with zero tolerance — the
    * aux ints are spec-pinned bit-equal to the packed bytes the query
    * actually scans.
    */
  val s5AnnQuantized: QueryDef = QueryDef(
    "s5_ann_quantized",
    (s, dir) => {
      import graft.expressions.Quant
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), Quant.bytes(col("embedding")).as("qv"),
          Quant.scale(col("embedding")).as("sc"))
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
            col("sc").as("qsc")))
      val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
      e.select(col("vec_id").as("neighbor_id"), col("qv"), col("sc"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("score",
          (Quant.dot(col("qqv"), col("qv")).cast("double") * col("qsc")) * col("sc"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "score")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/s5_ann_quantized__qvecs/*.parquet'))
      SELECT query_id, rank, neighbor_id, score FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               (LIST_DOT_PRODUCT(CAST(q.q AS DOUBLE[]), CAST(e.q AS DOUBLE[]))
                 * q.scale) * e.scale AS score,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY (LIST_DOT_PRODUCT(CAST(q.q AS DOUBLE[]), CAST(e.q AS DOUBLE[]))
                                             * q.scale) * e.scale DESC,
                                           e.vec_id) AS rank
        FROM v q JOIN v e ON q.vec_id < 10 AND e.vec_id != q.vec_id)
      WHERE rank <= 10 ORDER BY query_id, rank"""),
    aux = Map("qvecs" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.expressions.Quant.ints(col("embedding")).as("q"),
          graft.expressions.Quant.scale(col("embedding")).as("scale"))
        .orderBy("vec_id")))
  )

  /** Hard-negative mining — the contrastive-training sampler: for each
    * query, the top-k most-similar corpus vectors EXCLUDING
    * near-duplicates (quantized cosine ≥ 0.9), i.e. "similar but not the
    * same" — exactly what embedding-model training wants as negatives
    * (true duplicates would be false negatives and poison the loss).
    * Runs over d10's planted corpus so the exclusion is non-vacuous:
    * query 0's planted near-copy (id 1000000) ranks FIRST by similarity
    * and must be cut.
    *
    * The score is the scale-free quantized cosine dot_q(a,b) /
    * √(dot_q(a,a)·dot_q(b,b)) — all three dots are exact integers, the
    * arithmetic is the same IEEE expression on both engines, so the
    * oracle replays ranking AND exclusion from the aux ints with zero
    * tolerance.
    */
  val s6HardNegatives: QueryDef = QueryDef(
    "s6_hard_negatives",
    (s, dir) => {
      import graft.expressions.Quant
      val base = graft.dedup.DedupQueries.d10Vecs(s, dir)
        .select(col("vec_id"), Quant.bytes(col("embedding")).as("qv"))
        .withColumn("sd", Quant.dot(col("qv"), col("qv")))
      val q = broadcast(base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("sd").as("qsd")))
      val w = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("neighbor_id"))
      base.select(col("vec_id").as("neighbor_id"), col("qv"), col("sd"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("qcos",
          Quant.dot(col("qqv"), col("qv")).cast("double") /
            sqrt((col("qsd") * col("sd")).cast("double")))
        .filter(col("qcos") < 0.9)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", "qcos")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/s6_hard_negatives__qvecs/*.parquet')),
      p AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               LIST_DOT_PRODUCT(CAST(q.q AS DOUBLE[]), CAST(e.q AS DOUBLE[]))
                 / SQRT(CAST(q.sd * e.sd AS DOUBLE)) AS qcos
        FROM v q JOIN v e ON q.vec_id < 10 AND e.vec_id != q.vec_id),
      f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY qcos DESC, neighbor_id) AS rank
            FROM p WHERE qcos < 0.9)
      SELECT query_id, rank, neighbor_id, qcos
      FROM f WHERE rank <= 5 ORDER BY query_id, rank"""),
    aux = Map("qvecs" -> ((s, dir) => {
      import graft.expressions.Quant
      graft.dedup.DedupQueries.d10Vecs(s, dir)
        .select(col("vec_id"), Quant.ints(col("embedding")).as("q"))
        .withColumn("sd",
          org.apache.spark.sql.functions.aggregate(col("q"), lit(0L),
            (acc, x) => acc + x.cast("long") * x.cast("long")))
        .orderBy("vec_id")
    }))
  )

  /** Two-stage retrieval — the production serving pattern: a CHEAP
    * quantized scorer shortlists 50 candidates per query (int8 dot over
    * the 4×-smaller packed corpus), then the EXACT f32 cosine re-ranks
    * only the shortlist to a top-10. At scale stage 1 is the only pass
    * over the corpus (memory-bandwidth-bound, integer kernels) and stage
    * 2 touches 50 vectors per query — the coarse→fine split every real
    * ANN deployment runs. Both stages are deterministic with id
    * tie-breaks, so the oracle replays shortlist AND re-rank from the
    * aux dump (quantized ints + raw floats side by side) with zero
    * tolerance.
    */
  val s7AnnRerank: QueryDef = QueryDef(
    "s7_ann_rerank",
    (s, dir) => {
      import graft.expressions.Quant
      val base = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Quant.bytes(col("embedding")).as("qv"),
          Quant.scale(col("embedding")).as("sc"))
      val q = broadcast(base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("qv").as("qqv"), col("sc").as("qsc")))
      val wQ = Window.partitionBy("query_id")
        .orderBy(col("qscore").desc, col("neighbor_id"))
      val wE = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))
      base.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("qv"), col("sc"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("qscore",
          (Quant.dot(col("qqv"), col("qv")).cast("double") * col("qsc")) * col("sc"))
        .withColumn("shortlist_rank", row_number().over(wQ))
        .filter(col("shortlist_rank") <= 50)
        .withColumn("cos", cosineFast(col("qe"), col("nv")))
        .withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/s7_ann_rerank__vecs/*.parquet')),
      p AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               (LIST_DOT_PRODUCT(CAST(q.q AS DOUBLE[]), CAST(e.q AS DOUBLE[]))
                 * q.scale) * e.scale AS qscore,
               LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos
        FROM v q JOIN v e ON q.vec_id < 10 AND e.vec_id != q.vec_id),
      sl AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY qscore DESC, neighbor_id) AS shortlist_rank
        FROM p),
      rr AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS rank
        FROM sl WHERE shortlist_rank <= 50)
      SELECT query_id, rank, neighbor_id, cos
      FROM rr WHERE rank <= 10 ORDER BY query_id, rank"""),
    aux = Map("vecs" -> ((s, dir) => {
      import graft.expressions.Quant
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Quant.ints(col("embedding")).as("q"),
          Quant.scale(col("embedding")).as("scale"))
        .orderBy("vec_id")
    }))
  )

  /** FILTERED (hybrid) vector search — the metadata-predicate + ANN
    * combination every production vector store serves ("nearest neighbors
    * WHERE label = x"): the corpus predicate (here vec_id % 3 = 0, the
    * deterministic stand-in for a metadata column) applies BEFORE cell
    * probing, so the index prunes to nprobe/k of the *filtered* corpus —
    * pre-filtered search, not post-filtering a top-k that may then come
    * up short. The index itself stays trained on the full corpus
    * (build-once, shared with s3 via `Ivf.trainCached`); the oracle
    * replays the probed-cell + predicate top-k exhaustively from the
    * same aux dumps s3 uses.
    */
  val s8FilteredAnn: QueryDef = QueryDef(
    "s8_filtered_ann",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.search(e.filter(col("vec_id") % 3 === 0), queries, model,
        k = 16, nprobe = 3, topK = 10)
    },
    Some("""
      WITH cells AS (SELECT * FROM read_parquet('{OUT}/aux/s8_filtered_ann__cells/*.parquet')),
      probes AS (SELECT * FROM read_parquet('{OUT}/aux/s8_filtered_ann__probes/*.parquet')),
      cand AS (
        SELECT p.query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN cells c ON p.cell = c.cell AND c.vec_id <> p.query_id
        WHERE c.vec_id % 3 = 0),
      scored AS (
        SELECT c.query_id, c.neighbor_id,
               LIST_COSINE_SIMILARITY(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])) AS cos
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 10 ORDER BY query_id, rank"""),
    aux = Map(
      "cells" -> ((s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
        e.select(col("vec_id"),
          graft.expressions.GraftExpressions.ivfCell(col("embedding"), model, 16).as("cell"))
          .orderBy("vec_id")
      }),
      "probes" -> ((s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = Ivf.trainCached(e, Tables.corpusCacheKey(s, dir, "embeddings"),
          "embedding", k = 16, iters = 2)
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            explode(graft.expressions.GraftExpressions.ivfProbeCells(
              col("embedding"), model, 16, 3)).as("cell"))
          .orderBy("query_id", "cell")
      }))
  )

  /** Distributed k-means over the embedding corpus — the clustering
    * primitive under SemDeDup (d10) and IVF (s3), here surfaced as an
    * oracle-checked operator in its own right: two unrolled Lloyd
    * iterations from a deterministic seed (the 8 lowest vec_ids), then
    * per-cluster occupancy.
    *
    * Exactness design: coordinates are snapped to a global ×64
    * fixed-point grid (FLOOR(x·64) — multiply by a power of two then
    * floor, both engines bit-identical), and the assignment step NEVER
    * DIVIDES: a centroid is kept as the rational (S, n) = (coordinate
    * sums, member count), and argmin_c ‖x − S_c/n_c‖² is evaluated as
    * argmin_c  n_c²·(x·x) − 2·n_c·(x·S_c) + (S_c·S_c) — all integer
    * arithmetic (Spark in BIGINT, DuckDB in integer-exact doubles
    * < 2⁵³), so the 2-iteration trajectory matches the oracle exactly.
    * Ties break by cid; emptied clusters drop out of the next round in
    * both engines (inner-join semantics).
    *
    * Plan at 100 TB: centroids are k×d ≈ nothing — broadcast; each
    * iteration is ONE corpus scan (crossJoin with the broadcast k rows +
    * a per-vector window over k candidates), and the update is a
    * (cid, dim) grid aggregate — k·d cells of map-side-combined longs,
    * the textbook scalable-k-means shuffle. Production would swap the
    * lowest-id seed for k-means‖ and float centroids; the division-free
    * rational form is what makes the operator oracle-verifiable.
    */
  val s9Kmeans: QueryDef = QueryDef(
    "s9_kmeans",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      val q = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(64.0)).cast("long")).as("qv"))
      // codegen'd long dots (the s10 discipline) — the interpreted
      // aggregate/zip_with folds evaluated per (vector × candidate) row
      val ldot = graft.expressions.GraftExpressions.longDot _
      val qx = q.withColumn("xx", ldot(col("qv"), col("qv")))
      val c0 = q.orderBy("vec_id").limit(8)
        .withColumn("cid",
          row_number().over(Window.orderBy("vec_id")).cast("long") - 1L)
        .select(col("cid"), col("qv").as("s"), lit(1L).as("n"))
      def assign(cents: DataFrame): DataFrame = {
        val xs = ldot(col("qv"), col("s"))
        val ss = ldot(col("s"), col("s"))
        val w = Window.partitionBy("vec_id").orderBy("score", "cid")
        qx.crossJoin(broadcast(cents))
          .withColumn("score",
            col("n") * col("n") * col("xx") - lit(2L) * col("n") * xs + ss)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select("vec_id", "qv", "xx", "cid")
      }
      val a1 = assign(c0)
      val sums = a1
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(sum("v").as("sv"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          t => t.getField("sv")).as("s"))
      val c1 = sums.join(a1.groupBy("cid").agg(count(lit(1)).as("n")),
        Seq("cid"))
      assign(c1)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sum("xx").as("sum_xx"))
        .orderBy("cid")
    },
    Some("""
      WITH q AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> FLOOR(x * 64.0)) AS qv
        FROM embeddings),
      qx AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS xx FROM q),
      c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid,
               qv AS s, CAST(1 AS DOUBLE) AS n
        FROM (SELECT * FROM q ORDER BY vec_id LIMIT 8)),
      sc1 AS (
        SELECT qx.vec_id, qx.qv, qx.xx, c0.cid,
               c0.n * c0.n * qx.xx - 2 * c0.n * list_dot_product(qx.qv, c0.s)
                 + list_dot_product(c0.s, c0.s) AS score
        FROM qx, c0),
      a1 AS (
        SELECT vec_id, qv, xx, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY score, cid) AS rnk
          FROM sc1) WHERE rnk = 1),
      grid AS (
        SELECT cid, dim, SUM(v) AS sv
        FROM (SELECT cid, UNNEST(qv) AS v,
                     UNNEST(generate_series(1, len(qv))) AS dim
              FROM a1)
        GROUP BY cid, dim),
      c1 AS (
        SELECT ss.cid, ss.s, ns.n FROM
          (SELECT cid, list(sv ORDER BY dim) AS s FROM grid GROUP BY cid) ss
          JOIN (SELECT cid, CAST(COUNT(*) AS DOUBLE) AS n
                FROM a1 GROUP BY cid) ns USING (cid)),
      sc2 AS (
        SELECT qx.vec_id, qx.xx, c1.cid,
               c1.n * c1.n * qx.xx - 2 * c1.n * list_dot_product(qx.qv, c1.s)
                 + list_dot_product(c1.s, c1.s) AS score
        FROM qx, c1),
      a2 AS (
        SELECT vec_id, xx, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY score, cid) AS rnk
          FROM sc2) WHERE rnk = 1)
      SELECT cid, COUNT(*) AS n, CAST(SUM(xx) AS BIGINT) AS sum_xx
      FROM a2 GROUP BY cid ORDER BY cid""")
  )

  /** PRODUCT QUANTIZATION (PQ) search — the compressed-domain ANN that
    * serves billion-vector corpora (the FAISS IndexPQ shape): the 64-dim
    * space splits into m = 8 subspaces of 8 dims, each subspace trains
    * its own tiny codebook (k = 4, seeded from the 4 lowest ids + one
    * Lloyd iteration — s9's division-free rational-centroid discipline
    * per subspace), every corpus vector compresses to 8 code bytes, and
    * queries score candidates by ASYMMETRIC DISTANCE (ADC): the exact
    * query-to-centroid distance table replaces query-to-vector work, so
    * ranking cost is m table lookups per candidate over a corpus 32×
    * smaller than float32.
    *
    * Exactness: all integer arithmetic up to the per-subspace rational
    * distance (num/n² — ONE IEEE division per (query, sub, centroid)
    * cell), and the ADC sum over the 8 subspaces is written as an
    * explicit fixed-order 8-term addition in BOTH engines (pivot to
    * d0..d7 then d0+d1+…+d7 — the t19 fixed-order discipline), so the
    * final ranking compares bit-exact with zero tolerance.
    *
    * 100 TB shape: codebooks are m×k×(d/m) ≈ nothing (broadcast);
    * training and encoding are each one corpus scan + a (sub, cid, pos)
    * grid aggregate; serving joins the code table against the broadcast
    * per-query distance tables — the corpus never shuffles.
    */
  val s10PqAdc: QueryDef = QueryDef(
    "s10_pq_adc",
    (s, dir) => {
      import org.apache.spark.sql.{Column, DataFrame}
      // codegen'd long-array dot (GraftExpressions.LongDotExpr) — the
      // interpreted aggregate(zip_with(...)) fold it replaces dominated
      // both eval time and expression-tree analysis in this query's
      // fold-per-candidate scoring
      def adot(a: Column, b: Column): Column =
        graft.expressions.GraftExpressions.longDot(a, b)
      val q0 = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(64.0)).cast("long")).as("qv"))
      val subs = q0.select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(7)),
          i => struct(i.cast("int").as("sub"),
            slice(col("qv"), i * lit(8) + lit(1), lit(8)).as("sv"))))
          .as("e"))
        .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
      // The 4 seed ids are a bounded driver collect (k is a constant of
      // the codebook, never of the corpus): inlining them as a pushed-down
      // IN filter spares the full corpus scan the broadcast-join probe
      // side used to pay just to keep 4 vectors.
      val seedIds = q0.select(col("vec_id")).orderBy("vec_id").limit(4)
        .collect().map(_.getLong(0))
      val c0 = subs.filter(col("vec_id").isin(seedIds.toSeq: _*))
        .select(col("sub"),
          seedIds.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (id, i)) =>
            when(col("vec_id") === id, lit(i.toLong)).otherwise(acc)
          }.as("cid"),
          col("sv").as("s"), lit(1L).as("n"))
      // Assignment is argmin over ≤ k = 4 candidate centroids — k×m rows
      // total — so it is a broadcast-ARRAY fold, not a window: collapsing
      // the per-sub candidates to one array row and folding argmin inside
      // the expression runs with ZERO exchange, and (decisively for the
      // decade profile) leaves `codes` scan-partitioned with all 8 subs
      // of a vector colocated, so the downstream ADC groupBy fully
      // combines map-side (10 rows per vector cross every mapper) — the
      // previous hash(vec_id, sub) window partitioning scattered a
      // vector's subs across mappers and partial aggregation degraded
      // with the partition count (measured 12.8× records per 9.6× rows
      // on decade 2; linear after this change). Argmin is
      // array_min over (score, cid) structs — struct ordering compares
      // score first, then cid, which IS the oracle's ROW_NUMBER() ...
      // ORDER BY score, cid tie-break (cids are distinct within a sub) —
      // all-integer arithmetic, so bit-equal assignment, and an
      // order-independent reduction with a far smaller expression tree
      // than an explicit fold (the fold's analysis dominated driver time).
      def assign(cents: DataFrame): DataFrame = {
        // candidate-invariant factors leave the (interpreted) transform
        // for codegen'd projections: sv·sv once per row, s·s once per
        // centroid (32 rows) — the transform then does one 8-long dot
        // per candidate
        val bySub = cents
          .withColumn("ss", adot(col("s"), col("s")))
          .groupBy("sub")
          .agg(collect_list(
            struct(col("cid"), col("n"), col("s"), col("ss"))).as("cands"))
        val best = array_min(transform(
          col("cands"),
          c => struct(
            (c.getField("n") * c.getField("n") * col("xx") -
              lit(2L) * c.getField("n") * adot(col("sv"), c.getField("s")) +
              c.getField("ss")).as("score"),
            c.getField("cid").as("cid"))))
        subs.withColumn("xx", adot(col("sv"), col("sv")))
          .join(broadcast(bySub), Seq("sub"))
          .select(col("vec_id"), col("sub"), col("sv"),
            best.getField("cid").as("cid"))
      }
      // One aggregate pass builds the trained codebook: the per-position
      // row count IS the member count n (every member contributes exactly
      // one value per position), so folding it into the grid aggregate
      // spares the second full a1 execution the count-join used to pay.
      // The 32-row codebook then materializes eagerly (localCheckpoint):
      // `codes` and the per-query distance tables both consume the SAME
      // trained centroids instead of re-running training per consumer —
      // the timed path stays the full train → encode → serve pipeline,
      // executed once each.
      val a1 = assign(c0)
      val c1 = a1
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("sub", "cid", "pos")
        .agg(sum("v").as("svsum"), count(lit(1)).as("nn"))
        .groupBy("sub", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("svsum")))),
          t => t.getField("svsum")).as("s"),
          max("nn").as("n"))
        .localCheckpoint(eager = true)
      val codes = assign(c1).select(col("vec_id"), col("sub"), col("cid"))
      val dtab = subs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("sub"), col("sv"))
        .join(broadcast(c1), Seq("sub"))
        .select(col("query_id"), col("sub"), col("cid"),
          ((col("n") * col("n") * adot(col("sv"), col("sv")) -
            lit(2L) * col("n") * adot(col("sv"), col("s")) +
            adot(col("s"), col("s"))).cast("double") /
            (col("n") * col("n")).cast("double")).as("d"))
      val pivots = (0 until 8).map(i =>
        max(when(col("sub") === i, col("d"))).as(s"d$i"))
      val adc = codes.join(broadcast(dtab), Seq("sub", "cid"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
        .agg(pivots.head, pivots.tail: _*)
        .withColumn("dist",
          (0 until 8).map(i => col(s"d$i")).reduce(_ + _))
      val w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
      adc.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", "dist")
        .orderBy("query_id", "rank")
    },
    Some("""
      WITH q0 AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> FLOOR(x * 64.0)) AS qv
        FROM embeddings),
      subs AS (
        SELECT vec_id, s AS sub, qv[s*8+1 : s*8+8] AS sv
        FROM q0, (SELECT UNNEST(generate_series(0, 7)) AS s)),
      seed AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid
        FROM (SELECT vec_id FROM q0 ORDER BY vec_id LIMIT 4)),
      c0 AS (
        SELECT subs.sub, seed.cid, subs.sv AS s, CAST(1 AS DOUBLE) AS n
        FROM subs JOIN seed USING (vec_id)),
      sc1 AS (
        SELECT subs.vec_id, subs.sub, subs.sv, c0.cid,
               c0.n*c0.n*list_dot_product(subs.sv, subs.sv)
                 - 2*c0.n*list_dot_product(subs.sv, c0.s)
                 + list_dot_product(c0.s, c0.s) AS score
        FROM subs JOIN c0 ON c0.sub = subs.sub),
      a1 AS (
        SELECT vec_id, sub, sv, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                      ORDER BY score, cid) AS rnk
          FROM sc1) WHERE rnk = 1),
      grid AS (
        SELECT sub, cid, dim, SUM(v) AS svsum
        FROM (SELECT sub, cid, UNNEST(sv) AS v,
                     UNNEST(generate_series(1, len(sv))) AS dim FROM a1)
        GROUP BY sub, cid, dim),
      c1 AS (
        SELECT g.sub, g.cid, g.s, ns.n FROM
          (SELECT sub, cid, list(svsum ORDER BY dim) AS s
           FROM grid GROUP BY sub, cid) g
          JOIN (SELECT sub, cid, CAST(COUNT(*) AS DOUBLE) AS n
                FROM a1 GROUP BY sub, cid) ns USING (sub, cid)),
      sc2 AS (
        SELECT subs.vec_id, subs.sub, c1.cid,
               c1.n*c1.n*list_dot_product(subs.sv, subs.sv)
                 - 2*c1.n*list_dot_product(subs.sv, c1.s)
                 + list_dot_product(c1.s, c1.s) AS score
        FROM subs JOIN c1 ON c1.sub = subs.sub),
      codes AS (
        SELECT vec_id, sub, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                      ORDER BY score, cid) AS rnk
          FROM sc2) WHERE rnk = 1),
      dtab AS (
        SELECT subs.vec_id AS query_id, subs.sub, c1.cid,
               (c1.n*c1.n*list_dot_product(subs.sv, subs.sv)
                  - 2*c1.n*list_dot_product(subs.sv, c1.s)
                  + list_dot_product(c1.s, c1.s)) / (c1.n*c1.n) AS d
        FROM subs JOIN c1 ON c1.sub = subs.sub
        WHERE subs.vec_id < 10),
      cells AS (
        SELECT dtab.query_id, codes.vec_id AS neighbor_id,
               MAX(CASE WHEN dtab.sub = 0 THEN d END) AS d0,
               MAX(CASE WHEN dtab.sub = 1 THEN d END) AS d1,
               MAX(CASE WHEN dtab.sub = 2 THEN d END) AS d2,
               MAX(CASE WHEN dtab.sub = 3 THEN d END) AS d3,
               MAX(CASE WHEN dtab.sub = 4 THEN d END) AS d4,
               MAX(CASE WHEN dtab.sub = 5 THEN d END) AS d5,
               MAX(CASE WHEN dtab.sub = 6 THEN d END) AS d6,
               MAX(CASE WHEN dtab.sub = 7 THEN d END) AS d7
        FROM codes JOIN dtab ON dtab.sub = codes.sub AND dtab.cid = codes.cid
        WHERE codes.vec_id <> dtab.query_id
        GROUP BY dtab.query_id, codes.vec_id),
      adc AS (
        SELECT query_id, neighbor_id,
               d0 + d1 + d2 + d3 + d4 + d5 + d6 + d7 AS dist
        FROM cells)
      SELECT query_id, rank, neighbor_id, dist FROM (
        SELECT query_id, neighbor_id, dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dist, neighbor_id) AS rank
        FROM adc)
      WHERE rank <= 5 ORDER BY query_id, rank""")
  )

  /** MMR (maximal-marginal-relevance) DIVERSIFIED rerank — the RAG/
    * retrieval head that trades pure relevance for coverage: greedily
    * pick 5 of the top-20 shortlist maximizing `2·rel(d) − max_{s∈S}
    * sim(d, s)` (λ=2/3 in integer weights). The arithmetic lives
    * entirely in the QUANTIZED INT dot domain (s5's discipline), so
    * every comparison is exact-integer and the greedy trajectory is
    * bit-deterministic — which is what lets the oracle replay all five
    * unrolled selection steps relationally. Distribution split mirrors
    * production rerankers: shortlist generation is the corpus-scale part
    * (one TakeOrdered scan, no shuffle); the O(k²) MMR greedy runs on
    * the k=20-item shortlist (driver-bounded, the IVF-model precedent).
    */
  val s11MmrRerank: QueryDef = QueryDef(
    "s11_mmr_rerank",
    (s, dir) => {
      import graft.expressions.Quant
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), Quant.bytes(col("embedding")).as("qv"))
      val qv = e.filter(col("vec_id") === 0).head.getAs[Array[Byte]]("qv")
      val shortlist = e.filter(col("vec_id") =!= 0)
        .withColumn("rel", Quant.dot(lit(qv), col("qv")))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(20)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Array[Byte]]("qv"),
          r.getAs[Long]("rel")))
      val selected =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Long, Long)]
      (1 to 5).foreach { rank =>
        val chosen = shortlist
          .filterNot { case (id, _, _) => selected.exists(_._1 == id) }
          .map { case (id, v, rel) =>
            val div =
              if (selected.isEmpty) 0L
              else selected.map(sv => Quant.int8Dot(v, sv._2)).max
            (id, v, rel, div, 2 * rel - div)
          }
          .minBy { case (id, _, _, _, mmr) => (-mmr, id) }
        selected += ((chosen._1, chosen._2))
        out += ((rank, chosen._1, chosen._3, chosen._4, chosen._5))
      }
      out.toSeq.toDF("rank", "vec_id", "rel", "div", "mmr").orderBy("rank")
    },
    Some {
      def maxSimTo(prev: String) =
        s"""(SELECT MAX(CAST(LIST_DOT_PRODUCT(CAST(c.q AS DOUBLE[]),
             CAST(s.q AS DOUBLE[])) AS BIGINT)) FROM ($prev) s)"""
      val steps = new StringBuilder
      (2 to 5).foreach { k =>
        val prev = (1 until k).map(i => s"SELECT * FROM sel$i")
          .mkString(" UNION ALL ")
        steps.append(s""",
      sel$k AS (
        SELECT $k AS rank, c.vec_id, c.rel,
               ${maxSimTo(prev)} AS div,
               2 * c.rel - ${maxSimTo(prev)} AS mmr, c.q
        FROM short c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM ($prev))
        ORDER BY mmr DESC, c.vec_id LIMIT 1)""")
      }
      s"""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/s11_mmr_rerank__qvecs/*.parquet')),
      q AS (SELECT q AS qq FROM v WHERE vec_id = 0),
      rel AS (
        SELECT v.vec_id,
               CAST(LIST_DOT_PRODUCT(CAST(v.q AS DOUBLE[]),
                 CAST(qq AS DOUBLE[])) AS BIGINT) AS rel, v.q
        FROM v, q WHERE v.vec_id != 0),
      short AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 20),
      sel1 AS (
        SELECT 1 AS rank, vec_id, rel, CAST(0 AS BIGINT) AS div,
               2 * rel AS mmr, q
        FROM short ORDER BY mmr DESC, vec_id LIMIT 1)${steps}
      SELECT rank, vec_id, rel, div, mmr
      FROM (${(1 to 5).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")})
      ORDER BY rank"""
    },
    aux = Map("qvecs" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.expressions.Quant.ints(col("embedding")).as("q"))
        .orderBy("vec_id")))
  )

  val all: Seq[QueryDef] =
    Seq(s1AnnBruteForce, s2AnnLsh, s3AnnIvf, s4RangeSearch, s5AnnQuantized,
      s6HardNegatives, s7AnnRerank, s8FilteredAnn, s9Kmeans, s10PqAdc,
      s11MmrRerank)
}
