package graft.dedup

import graft.QueryDef
import graft.core.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Dedup query surface over `documents` / `embeddings`.
  *
  * Oracle strategy: the MinHash-LSH result is verified against DuckDB's
  * brute-force O(n²) Jaccard join — at sf0.01 the oracle is feasible while
  * the Spark side runs the LSH plan that scales (candidates via bucket
  * join, not cross join). Exact dedup and n-gram Jaccard are directly
  * SQL-expressible.
  */
object DedupQueries {

  /** Exact dedup by content digest: canonical (min) doc id + group size
    * per distinct text. Grouping key is the 32-byte sha256, not the text,
    * so the shuffle stays narrow at scale.
    */
  val d1ExactDedup: QueryDef = QueryDef(
    "d1_exact_dedup",
    (s, dir) =>
      Tables.loadSpread(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("content_key"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("content_key", "canonical_id", "n_copies")
        .orderBy("canonical_id"),
    Some("""
      SELECT sha256(text) AS content_key, MIN(doc_id) AS canonical_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY text ORDER BY canonical_id""")
  )

  private def duckShingleCte: String = """
      WITH s AS (
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                 GENERATE_SERIES(1, LENGTH(STRING_SPLIT(text,' ')) - 2),
                 i -> CONCAT(STRING_SPLIT(text,' ')[i], ' ',
                             STRING_SPLIT(text,' ')[i+1], ' ',
                             STRING_SPLIT(text,' ')[i+2]))) AS sh
        FROM documents
        WHERE LENGTH(STRING_SPLIT(text,' ')) >= 3)"""

  /** MinHash + LSH near-dup pairs (threshold 0.8 Jaccard on word
    * 3-shingles). The oracle is the brute-force pair join — LSH with 16
    * bands × 4 rows has ~1e-7 false-negative probability at j≥0.89 (the
    * data's near-dup band), and the exact verify removes false positives.
    */
  val d2MinhashLsh: QueryDef = QueryDef(
    "d2_minhash_lsh",
    (s, dir) =>
      Dedup.minhashNearDupPairs(
        Tables.loadSpread(s, dir, "documents"), "doc_id", "text", threshold = 0.8)
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      $duckShingleCte
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(LENGTH(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE)
               / (LENGTH(a.sh) + LENGTH(b.sh) - LENGTH(LIST_INTERSECT(a.sh, b.sh))) AS jaccard
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE CAST(LENGTH(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE)
              / (LENGTH(a.sh) + LENGTH(b.sh) - LENGTH(LIST_INTERSECT(a.sh, b.sh))) >= 0.8
      ORDER BY doc_a, doc_b""")
  )

  /** SimHash near-dup pairs at hamming distance <= 6, found via band-PAIR
    * blocking: the 64-bit signature splits into 8 byte-bands, and each doc
    * emits one 16-bit key per band pair (i<j, 28 keys). Pigeonhole: <=6
    * errors touch at most 6 of the 8 bands, so every qualifying pair shares
    * >=2 clean bands and therefore at least one exact pair-key — the join
    * is *complete* for the threshold, with ~3.4× fewer candidates than
    * single-byte banding on correlated data (16-bit buckets vs 8-bit).
    * The hamming filter runs BEFORE pair dedup: bit_count(xor) is one
    * codegen instruction per candidate, so the dedup shuffle only carries
    * the ~0.2% of candidates that qualify.
    *
    * Oracle: xxhash64 has no DuckDB analog, so the signatures themselves
    * are dumped as an aux table (pinned separately by DedupSpec) and the
    * oracle brute-forces the complete hamming-≤6 pair join over them —
    * verifying exactly the property the banding shortcut claims.
    */
  val d3Simhash: QueryDef = QueryDef(
    "d3_simhash",
    (s, dir) => {
      val docs = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      def byte(i: Int) = shiftrightunsigned(col("sig"), i * 8).bitwiseAND(lit(0xFFL))
      val pairKeys = for { i <- 0 until 8; j <- i + 1 until 8 } yield
        struct(lit(i * 8 + j).as("k"), (byte(i) * 256 + byte(j)).as("v"))
      val banded = docs
        .select(col("doc_id"), col("sig"), explode(array(pairKeys: _*)).as("kv"))
        .select(col("doc_id"), col("sig"),
          col("kv.k").as("band_key"), col("kv.v").as("band_val"))
      val a = banded.select(col("band_key"), col("band_val"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = banded.select(col("band_key"), col("band_val"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band_key", "band_val"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming", Dedup.hamming(col("sig_a"), col("sig_b")))
        .filter(col("hamming") <= 6)
        .dropDuplicates("doc_a", "doc_b")
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH s AS (SELECT * FROM read_parquet('{OUT}/aux/d3_simhash__sigs/*.parquet'))
      SELECT doc_a, doc_b, hamming FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sig, b.sig)) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id)
      WHERE hamming <= 6 ORDER BY doc_a, doc_b"""),
    aux = Map("sigs" -> ((s, dir) =>
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
        .orderBy("doc_id")))
  )

  /** n-gram Jaccard similarity join, EXACT via prefix filtering
    * (Dedup.jaccardJoin) within a blocking key (same `source`) — same
    * results as a brute pair join (the DuckDB oracle IS the brute join)
    * without the O(n²)-per-block candidate page.
    */
  val d4NgramJaccard: QueryDef = QueryDef(
    "d4_ngram_jaccard",
    (s, dir) =>
      Dedup.jaccardJoin(Tables.loadSpread(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, n = 2, blockCol = Some("source"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH s AS (
        SELECT doc_id, source,
               LIST_DISTINCT(LIST_TRANSFORM(
                 GENERATE_SERIES(1, LENGTH(STRING_SPLIT(text,' ')) - 1),
                 i -> CONCAT(STRING_SPLIT(text,' ')[i], ' ', STRING_SPLIT(text,' ')[i+1]))) AS sh
        FROM documents
        WHERE LENGTH(STRING_SPLIT(text,' ')) >= 2)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(LENGTH(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE)
                 / (LENGTH(a.sh) + LENGTH(b.sh) - LENGTH(LIST_INTERSECT(a.sh, b.sh))) AS jaccard
        FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id)
      WHERE jaccard >= 0.5
      ORDER BY doc_a, doc_b""")
  )

  /** Embedding-cosine near-dup over `documents`: each doc embeds as a
    * deterministic feature-hashed shingle vector (512-dim, L2=1 — planted
    * near-dup texts land at cos ≈ 2j/(1+j) ≈ 0.9, unrelated text at
    * ≈ 0.05, a wide thresholdable gap), then the banded hyperplane-LSH
    * path ([[graft.sim.EmbeddingDedup.nearDupPairs]]) generates candidate
    * pairs as a bucket equi-join and exact cosine verifies. The O(n²)
    * cross join exists ONLY in the DuckDB oracle (brute cosine join over
    * the aux-dumped vectors) — the registered plan is the one that runs at
    * 100 TB.
    */
  private val EmbedDim = 512

  private def docVecs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.loadSpread(s, dir, "documents")
      .select(col("doc_id"),
        graft.expressions.GraftExpressions.embedShingles(col("text"), 3, EmbedDim).as("vec"))
      .filter(array_max(col("vec")) > 0f) // <3-word docs embed to the zero vector

  /** d5's measured LSH sizing at a corpus dir — (n, effBits, effBands,
    * unique candidate pairs), with exactly d5's floor config. GrowthSpan
    * logs this per sf so the d5 exchange-growth adjudication decomposes
    * into measured factors instead of asserted ones.
    */
  def d5Diagnostics(s: org.apache.spark.sql.SparkSession, dir: String)
      : (Long, Int, Int, Long) =
    graft.sim.EmbeddingDedup.lshDiagnostics(docVecs(s, dir), "doc_id", "vec",
      dim = EmbedDim, bands = 32, bits = 12)

  val d5EmbeddingNearDup: QueryDef = QueryDef(
    "d5_embedding_neardup",
    (s, dir) =>
      graft.sim.EmbeddingDedup.nearDupPairs(docVecs(s, dir), "doc_id", "vec",
        dim = EmbedDim, threshold = 0.5, bands = 32, bits = 12)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("cos"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/d5_embedding_neardup__vecs/*.parquet'))
      SELECT doc_a, doc_b, cos FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               LIST_COSINE_SIMILARITY(CAST(a.vec AS DOUBLE[]),
                                      CAST(b.vec AS DOUBLE[])) AS cos
        FROM v a JOIN v b ON a.doc_id < b.doc_id)
      WHERE cos >= 0.5 ORDER BY doc_a, doc_b"""),
    aux = Map("vecs" -> ((s, dir) => docVecs(s, dir).orderBy("doc_id")))
  )

  /** Duplicate n-gram span detection — the training-data dedup primitive
    * of "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al., 2022): a word k-gram whose hash occurs at more than one
    * position corpus-wide marks BOTH spans as duplicated text; per
    * document the query reports how much of it is duplicated span mass.
    *
    * Plan shape at 100 TB: positions explode to (doc, pos, hash) — 8-byte
    * hashes, never strings — one groupBy(hash) finds corpus-wide
    * multi-occurrence hashes, one shuffle-reusing join flags positions,
    * one groupBy(doc) aggregates. Everything shuffles on narrow keys; no
    * pairwise comparison ever happens (contrast d2/d4, which emit PAIRS —
    * span dedup is linear in corpus size).
    *
    * Oracle: xxhash64 k-grams have no DuckDB analog, so the positional
    * hash table is aux-dumped (pinned against literal k-gram strings by
    * DedupSpec) and the oracle recomputes the span property exhaustively
    * over it.
    */
  val d6DupSpans: QueryDef = QueryDef(
    "d6_dup_spans",
    (s, dir) => {
      // Shape measured and kept as-is in r15: both rewrites that force a
      // single tokenize lose at sf0.1 (interleaved min-of-5: as-is 0.896,
      // raw (doc,h) localCheckpoint 0.932, (doc,h,cnt) pre-agg +
      // checkpoint 1.027 s) — the (doc,h) grain has ~no combining (8-gram
      // hashes are near-unique within a doc), so the pre-agg ADDS a
      // corpus-sized exchange, and the checkpoint barrier costs more
      // than the second generator pass it saves.
      val kg = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
            .as(Seq("pos", "h")))
      val dupHashes = kg.groupBy("h").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1)
        .select(col("h"), lit(1).as("dup"))
      kg.join(dupHashes, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"), count(col("dup")).as("n_dup"))
        .withColumn("dup_ratio",
          col("n_dup").cast("double") / col("n_kgrams").cast("double"))
        .orderBy("doc_id")
    },
    Some("""
      WITH k AS (SELECT * FROM read_parquet('{OUT}/aux/d6_dup_spans__kgrams/*.parquet')),
      c AS (SELECT h, 1 AS dup FROM k GROUP BY h HAVING COUNT(*) > 1)
      SELECT doc_id, COUNT(*) AS n_kgrams, COUNT(c.dup) AS n_dup,
             CAST(COUNT(c.dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
      FROM k LEFT JOIN c ON k.h = c.h
      GROUP BY doc_id ORDER BY doc_id"""),
    aux = Map("kgrams" -> ((s, dir) =>
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
            .as(Seq("pos", "h")))
        .orderBy("doc_id", "pos")))
  )

  /** Train/benchmark contamination check — the DECONTAMINATION primitive
    * every LLM training pipeline runs before training (n-gram overlap
    * against held-out evaluation sets, per GPT-3/PaLM data work): for
    * each candidate training document, the fraction of its word 8-grams
    * that appear anywhere in the benchmark set. Here the benchmark is
    * the doc_id % 20 == 0 slice, standing in for an external eval corpus.
    *
    * Plan shape at 100 TB: benchmark k-grams reduce to a DISTINCT 8-byte
    * hash set (tiny relative to the corpus — eval sets are small), the
    * train side LEFT joins it on the hash (multiplicity 1 — no fan-out),
    * and ONE groupBy(doc) produces both the total and the matched count.
    * Strings never shuffle; the benchmark side is broadcastable when it
    * fits; a persistent pipeline would checkpoint the hashed k-gram
    * stream at ingest instead of re-deriving it per leg.
    */
  val d7Contamination: QueryDef = QueryDef(
    "d7_contamination",
    (s, dir) => {
      // One-pass scoring (r15): the old plan ran the scan+kgramHashes
      // generator three times (bench distinct, train semi-join side,
      // train totals) and stitched totals to hits with a doc-keyed
      // join. Marking bench membership with a LEFT join against the
      // DISTINCT bench-hash set (multiplicity 1 — no fan-out) lets ONE
      // per-doc aggregate produce both totals and hits, dropping a
      // generator pass, a shuffle and two jobs. Interleaved A/B at
      // sf0.1 across quiet AND contended windows: orig 0.844–1.015,
      // this fold 0.713–0.746 s (−15–25%). Two checkpoint variants
      // measured and rejected: a (doc,h,cnt) pre-agg (grain has ~no
      // combining — only adds a corpus-sized exchange) and a raw
      // (doc,h) localCheckpoint (wins nothing when quiet, loses ~20%
      // under memory-bandwidth contention — the barrier plus
      // materialization outweigh the saved generator pass).
      val kg = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
            .as("h"))
      val bench = kg.filter(col("doc_id") % 20 === 0)
        .select(col("h")).distinct().withColumn("mark", lit(1))
      kg.filter(col("doc_id") % 20 =!= 0)
        .join(bench, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kgrams"),
          count(col("mark")).as("n_contaminated"))
        .withColumn("contamination",
          col("n_contaminated").cast("double") / col("n_kgrams").cast("double"))
        .select("doc_id", "n_kgrams", "n_contaminated", "contamination")
        .orderBy("doc_id")
    },
    Some("""
      WITH k AS (SELECT * FROM read_parquet('{OUT}/aux/d7_contamination__kgrams/*.parquet')),
      bench AS (SELECT DISTINCT h FROM k WHERE doc_id % 20 = 0),
      train AS (SELECT * FROM k WHERE doc_id % 20 <> 0)
      SELECT t.doc_id, COUNT(*) AS n_kgrams,
             COUNT(b.h) AS n_contaminated,
             CAST(COUNT(b.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination
      FROM train t LEFT JOIN bench b ON t.h = b.h
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    aux = Map("kgrams" -> ((s, dir) =>
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.expressions.GraftExpressions.kgramHashes(col("text"), 8))
            .as(Seq("pos", "h")))
        .orderBy("doc_id", "pos")))
  )

  /** The d2 pair list materialized once per corpus (same build-once
    * contract as [[graft.sim.Ivf.trainCached]]): clustering and its
    * verification dump are CONSUMERS of the pair artifact, not rebuilds
    * of it — deterministic LSH makes the memo semantically transparent.
    */
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  /** Cache key = corpus dir + source fingerprint (same contract as the
    * Tables spread cache): an in-place rewrite of documents.parquet within
    * a long-lived JVM gets a fresh computation instead of stale pairs.
    * Superseded entries stay checkpointed until JVM exit — unpersisting
    * them would invalidate previously returned handles mid-query, and
    * in-place rewrites are rare enough that the bounded pin is the
    * cheaper failure mode. */
  private[graft] def corpusKey(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    Tables.corpusCacheKey(s, dir, "documents")

  private def nearDupPairsCached(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    nearDupPairsKeyed(s, dir, corpusKey(s, dir))

  private def nearDupPairsKeyed(s: org.apache.spark.sql.SparkSession,
      dir: String, key: String): org.apache.spark.sql.DataFrame =
    pairsCache.computeIfAbsent(key, _ =>
      Dedup.minhashNearDupPairs(
        Tables.loadSpread(s, dir, "documents"), "doc_id", "text", threshold = 0.8)
        .localCheckpoint(eager = true))

  /** Cluster assignment over the d2 near-dup pairs: every doc touched by
    * a near-dup pair labels with its connected component's min doc id —
    * the "which copies collapse, which survives" answer a dedup pipeline
    * actually emits. The oracle computes the same components exhaustively
    * via a recursive transitive closure over the aux-dumped pair list.
    */
  /** Connected-component assignment over the cached d2 pairs, memoized
    * per corpus dir FOR DOWNSTREAM VIEWS: in production the assignment is
    * computed once per corpus snapshot and every retention/reporting query
    * reads it. d8 IS the assignment operator — it pays the label
    * propagation on every run (and is what GrowthSpan meters across
    * decades); d11 is the retention POLICY over the same assignment and
    * consumes this cache (disclosed in Bench's `amortized` map — its
    * first_pass carries pairs + label-propagation cost).
    * [[Dedup.dedupClusters]] returns an eagerly checkpointed frame, so
    * the cached value is a materialized table, not live lineage.
    */
  private[graft] val clustersCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private[graft] def dedupClustersCached(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // fingerprint ONCE per invocation and thread the key down — the
    // pairs lookup inside the miss path reuses it instead of re-listing
    // the same documents.parquet (the key identifies the same snapshot
    // by construction: both caches derive from that one table)
    val key = corpusKey(s, dir)
    clustersCache.computeIfAbsent(key, _ =>
      Dedup.dedupClusters(nearDupPairsKeyed(s, dir, key)))
  }

  val d8DedupClusters: QueryDef = QueryDef(
    "d8_dedup_clusters",
    (s, dir) =>
      Dedup.dedupClusters(nearDupPairsCached(s, dir))
        .orderBy("doc_id"),
    Some("""
      WITH RECURSIVE
      p AS (SELECT doc_a, doc_b
            FROM read_parquet('{OUT}/aux/d8_dedup_clusters__pairs/*.parquet')),
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
            UNION SELECT doc_b, doc_a FROM p),
      reach(src, node) AS (
        SELECT a, a FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.node)
      SELECT src AS doc_id, MIN(node) AS cluster
      FROM reach GROUP BY src ORDER BY doc_id"""),
    aux = Map("pairs" -> ((s, dir) =>
      nearDupPairsCached(s, dir)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")))
  )

  /** Incremental snapshot-over-ledger dedup ([[Dedup.incrementalDedup]]):
    * documents with `doc_id < 250` stand in for the already-ingested
    * corpus (reduced to its content-hash ledger); the new crawl snapshot
    * is the remaining docs PLUS re-crawls of 100 old pages (same text,
    * new ids +1000 — must be ledger-rejected) PLUS second copies of 50
    * new pages (ids +2000 — must lose within-batch first-wins). The
    * `documents` table itself has no exact duplicates, so without the
    * planted re-crawls both rejection rules would pass vacuously; with
    * them, 150 of 400 batch rows must be dropped, and the oracle replays
    * both rules relationally (NOT EXISTS + min-per-hash).
    */
  val d9IncrementalDedup: QueryDef = QueryDef(
    "d9_incremental_dedup",
    (s, dir) => {
      val docs = Tables.loadSpread(s, dir, "documents")
      // Hash the text ONCE into a slim (doc_id, content_key) table and
      // materialize it (localCheckpoint, ~40 B/row): the ledger and the
      // three batch branches are id-range slices of the SAME hashed scan,
      // and the bloom-screened anti-join executes its batch side three
      // times — without the checkpoint, that multiplied into ~10 full
      // text scans + sha256 passes per run. This is also the production
      // shape: a recurring crawl hashes each page once at ingest and
      // every downstream pass moves 32-byte keys, never documents.
      val hashed = graft.core.Materialize.pin(docs
        .select(col("doc_id"), sha2(col("text"), 256).as("content_key")))
      val ledger = hashed.filter(col("doc_id") < 250)
        .select("content_key").distinct()
      val batch = hashed.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("content_key"))
        .unionAll(hashed.filter(col("doc_id") < 100)
          .select((col("doc_id") + 1000).as("doc_id"), col("content_key")))
        .unionAll(hashed.filter(col("doc_id") >= 250 && col("doc_id") < 300)
          .select((col("doc_id") + 2000).as("doc_id"), col("content_key")))
      Dedup.incrementalDedupKeyed(batch, ledger)
        .orderBy("doc_id")
    },
    Some("""
      WITH batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 250
        UNION ALL
        SELECT doc_id + 1000, text FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 2000, text FROM documents WHERE doc_id >= 250 AND doc_id < 300)
      SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_key
      FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM documents l
                        WHERE l.doc_id < 250 AND sha256(l.text) = sha256(b.text))
      GROUP BY sha256(text)
      ORDER BY doc_id""")
  )

  /** Semantic dedup, SemDeDup-shape ([[graft.sim.SemanticDedup]]): k-means
    * cells bound the pairwise cosine search, and within each cell an id is
    * dropped when an earlier id sits at cosine ≥ 0.9. The `embeddings`
    * corpus has no semantic near-dups (max pairwise cos ≈ 0.51), so the
    * query PLANTS them: every 25th vector gains a near-copy (uniform 1.02×
    * scale + a nudged first component, id +1000000 — cosine ≈ 1 to its
    * source, scale-invariant under cosine) — without planting, the drop
    * rule would verify vacuously. Training is [[graft.sim.Ivf]]'s
    * deterministic Lloyd (first-k seed, exact decimal means), so the cell
    * assignment is a pure function of the corpus; the oracle takes the
    * dumped (id, cell, vector) assignment and exhaustively replays the
    * cell-scoped drop rule, with the cell expression itself pinned by
    * spec. Integer-only output keeps the compare off last-ulp cosines
    * (planted pairs ≈ 0.9999 vs background ≤ 0.52 — a wide margin around
    * the 0.9 threshold).
    */
  private val D10Cells = 8

  private[graft] def d10Vecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
    emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          expr("""transform(embedding, (x, i) ->
                    CAST((CASE WHEN i = 0 THEN x * 1.02 + 0.01
                               ELSE x * 1.02 END) AS FLOAT))""").as("embedding")))
  }

  private def d10Model(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.sim.Ivf.trainCached(d10Vecs(s, dir),
      Tables.corpusCacheKey(s, dir, "embeddings") + "#d10", "embedding",
      D10Cells, 2)

  val d10SemanticDedup: QueryDef = QueryDef(
    "d10_semantic_dedup",
    (s, dir) =>
      graft.sim.SemanticDedup.dropped(d10Vecs(s, dir), "vec_id", "embedding",
        d10Model(s, dir), D10Cells, 0.9)
        .orderBy("vec_id"),
    Some("""
      WITH v AS (SELECT * FROM read_parquet('{OUT}/aux/d10_semantic_dedup__cells/*.parquet')),
      p AS (SELECT a.vec_id AS ia, b.vec_id AS ib, b.cell,
                   LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) AS c
            FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT ib AS vec_id, MIN(cell) AS cell, MIN(ia) AS dup_of,
             COUNT(*) AS n_dups
      FROM p WHERE c >= 0.9
      GROUP BY ib ORDER BY vec_id"""),
    aux = Map("cells" -> ((s, dir) =>
      d10Vecs(s, dir)
        .select(col("vec_id"), col("embedding"),
          graft.expressions.GraftExpressions.ivfCell(col("embedding"),
            d10Model(s, dir), D10Cells).as("cell"))
        .orderBy("vec_id")))
  )

  /** CANONICAL-DOCUMENT selection — the retention POLICY on top of d8's
    * cluster assignment: within every near-dup cluster keep the longest
    * member (tie → lowest id), the published keep-longest curation rule
    * (d8 answers "which docs collapse"; d11 answers "which copy
    * survives, what got dropped"). The argmax rides a
    * `max(struct(n_chars, −doc_id))` aggregate — map-side combinable,
    * no per-cluster window sort — and the output is the per-cluster
    * retention manifest. The oracle reuses d8's exhaustive transitive
    * closure over the same aux pair dump, joined back to document
    * lengths.
    */
  val d11CanonicalSelect: QueryDef = QueryDef(
    "d11_canonical_select",
    (s, dir) => {
      val clusters = dedupClustersCached(s, dir)
      val docs = Tables.loadSpread(s, dir, "documents")
        .select("doc_id", "n_chars")
      clusters.join(docs, Seq("doc_id"))
        .groupBy("cluster")
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("best"),
          count(lit(1)).as("n_members"))
        .filter(col("n_members") >= 2)
        .select(col("cluster"), (-col("best.neg")).as("rep_doc"),
          col("best.n_chars").as("rep_chars"), col("n_members"),
          (col("n_members") - 1).as("n_dropped"))
        .orderBy("cluster")
    },
    Some("""
      WITH RECURSIVE
      p AS (SELECT doc_a, doc_b
            FROM read_parquet('{OUT}/aux/d11_canonical_select__pairs/*.parquet')),
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
            UNION SELECT doc_b, doc_a FROM p),
      reach(src, node) AS (
        SELECT a, a FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.node),
      cl AS (SELECT src AS doc_id, MIN(node) AS cluster
             FROM reach GROUP BY src),
      m AS (SELECT cl.cluster, d.doc_id, d.n_chars
            FROM cl JOIN documents d USING (doc_id)),
      best AS (
        SELECT cluster, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY n_chars DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY cluster) AS nm
        FROM m)
      SELECT cluster, doc_id AS rep_doc, n_chars AS rep_chars,
             CAST(nm AS BIGINT) AS n_members,
             CAST(nm - 1 AS BIGINT) AS n_dropped
      FROM best WHERE rn = 1 AND nm >= 2 ORDER BY cluster"""),
    aux = Map("pairs" -> ((s, dir) =>
      nearDupPairsCached(s, dir)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")))
  )

  /** ENTITY RESOLUTION (record linkage): fuzzy-match entity records and
    * assign each a canonical cluster id. Planted-variant synthesis (the
    * repo's standard move for a dup-free harness table): every 10th
    * customer gains a second record whose key string differs in its last
    * character, so ground truth is known. The pipeline is the published
    * blocked-matching shape:
    *
    *  1. entity key = md5(c_name) — hash-derived keys, because raw TPC-H
    *     names are near-identical BY CONSTRUCTION ("…001" vs "…002" is
    *     edit distance 1) and would make every consecutive pair a match;
    *     real ER normalizes/fingerprints names first for the same reason.
    *  2. BLOCKING on the 16-char key prefix → candidate pairs via
    *     equi-join, never an all-pairs cross join (the t22 lesson). A
    *     16-hex-char block has no accidental collisions, and the planted
    *     variant (last char of 32 changed) always shares its original's
    *     block.
    *  3. exact levenshtein ≤ 2 on the candidates only.
    *  4. cluster id = min id over self + matched partners — one
    *     aggregation, exact here because planted components are PAIRS;
    *     general transitive closure is pointer-doubling (q39) or the d8
    *     cluster walk, both already in the surface.
    *
    * Everything is an equi-join or a groupBy on hash-distributed keys —
    * the 100 TB shape. Oracle replays all four stages relationally
    * (DuckDB has md5 and levenshtein).
    */
  val er1EntityResolution: QueryDef = QueryDef(
    "er1_entity_resolution",
    (s, dir) => {
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          md5(col("c_name")).as("name"))
      val variants = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 10000000L).cast("long").as("id"),
          concat(substring(md5(col("c_name")), 1, 31), lit("z")).as("name"))
      val entities = base.unionByName(variants)
        .withColumn("block", substring(col("name"), 1, 16))
      val a = entities.select(col("block"), col("id").as("id1"),
        col("name").as("n1"))
      val b = entities.select(col("block"), col("id").as("id2"),
        col("name").as("n2"))
      val pairs = a.join(b, Seq("block"))
        .filter(col("id1") < col("id2") &&
          levenshtein(col("n1"), col("n2")) <= 2)
        .select("id1", "id2")
      val partners = pairs.select(col("id1").as("id"), col("id2").as("p"))
        .unionByName(pairs.select(col("id2").as("id"), col("id1").as("p")))
      entities.join(partners, Seq("id"), "left")
        .groupBy("id")
        .agg(least(coalesce(min(col("p")), col("id")), col("id"))
          .as("cluster_id"))
        .select(col("id").as("entity_id"), col("cluster_id"),
          (col("cluster_id") =!= col("id")).as("is_dup"))
        .orderBy("entity_id")
    },
    Some("""
      WITH e AS (
        SELECT CAST(c_custkey AS BIGINT) AS id, md5(c_name) AS name
        FROM customer
        UNION ALL
        SELECT CAST(c_custkey + 10000000 AS BIGINT),
               substr(md5(c_name), 1, 31) || 'z'
        FROM customer WHERE c_custkey % 10 = 0),
      blocked AS (SELECT id, name, substr(name, 1, 16) AS block FROM e),
      p AS (
        SELECT a.id AS id1, b.id AS id2
        FROM blocked a JOIN blocked b ON a.block = b.block AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 2),
      partners AS (
        SELECT id1 AS id, id2 AS p FROM p
        UNION ALL SELECT id2, id1 FROM p)
      SELECT e.id AS entity_id,
             LEAST(COALESCE(MIN(partners.p), e.id), e.id) AS cluster_id,
             LEAST(COALESCE(MIN(partners.p), e.id), e.id) <> e.id AS is_dup
      FROM e LEFT JOIN partners ON partners.id = e.id
      GROUP BY e.id ORDER BY entity_id""")
  )

  val all: Seq[QueryDef] =
    Seq(d1ExactDedup, d2MinhashLsh, d3Simhash, d4NgramJaccard,
      d5EmbeddingNearDup, d6DupSpans, d7Contamination, d8DedupClusters,
      d9IncrementalDedup, d10SemanticDedup, d11CanonicalSelect,
      er1EntityResolution)
}
