package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * aggregate + a codegen point-estimate probe — the frequency analog of
  * the bloom pair ([[BloomStateExpr]]/[[BloomContainsExpr]]).
  *
  * State = a depth × width grid of counters; update adds 1 to one cell
  * per row (double hashing h1 + d·h2, same probe family as the bloom);
  * estimate = min over the key's depth cells. Properties used here:
  *
  *  - MERGEABLE and ORDER-INDEPENDENT: merge is element-wise addition,
  *    so the serialized grid is identical on any partitioning — the
  *    sketch is deterministic and driver-tiny (depth·width longs,
  *    independent of input size);
  *  - estimates NEVER UNDERCOUNT (collisions only add), so
  *    `filter(cms_estimate(k) >= t)` before an exact recount keeps every
  *    truly-frequent key — the pattern `sketch-prune → exact recount`
  *    yields EXACT heavy hitters, verified against the plain
  *    GROUP BY / HAVING oracle (t18);
  *  - overcounted keys only cost recount shuffle; expected collision
  *    error is (input size)/width per row, which sizing keeps far below
  *    any useful threshold.
  */
case class CmsStateExpr(child: Expression, width: Int, depth: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(width >= 16, "width must be >= 16")
  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_state expects BIGINT, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(v.asInstanceOf[Long], buf, width, depth)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsStateExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsStateExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsStateExpr =
    copy(child = newChild)
}

/** Point-frequency estimate against a FIXED grid (built previously by
  * [[CmsStateExpr]] and collected/broadcast): stays inside whole-stage
  * codegen with the grid as a reference object, one static call per row.
  */
case class CmsEstimateExpr(child: Expression, counts: Array[Long],
    width: Int, depth: Int)
    extends UnaryExpression {
  require(counts.length == depth * width, "grid size mismatch")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def nullSafeEval(input: Any): Any =
    CountMin.estimate(input.asInstanceOf[Long], counts, width, depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsCounts", counts, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CountMin.estimate($c, $ref, $width, $depth)")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsEstimateExpr =
    copy(child = newChild)
}

/** The PPJoin frequency reorder as ONE codegen'd kernel: each row's hash
  * array sorted by (CMS-estimated df asc, hash asc). Replaces the
  * interpreted `transform(sort_array(transform(sh, h → struct(est(h), h))),
  * _.h)` chain, which evaluated the lambda per ELEMENT with struct boxing
  * and a generic struct comparator — the last per-row interpreted fold in
  * the d4 hot path. Identical ordering semantics: sort_array on
  * struct(df, h) is lexicographic (df, h) ascending, and estimates come
  * from the same [[CountMin.estimate]] probe against the same grid.
  */
case class CmsOrderExpr(child: Expression, counts: Array[Long],
    width: Int, depth: Int)
    extends UnaryExpression {
  require(counts.length == depth * width, "grid size mismatch")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_order expects ARRAY<BIGINT>, got ${other.sql}")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_order"
  override protected def nullSafeEval(input: Any): Any =
    CountMin.orderByEstimate(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      counts, width, depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsCounts", counts, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CountMin.orderByEstimate($c, $ref, $width, $depth)")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsOrderExpr =
    copy(child = newChild)
}

object CountMin {

  /** Row d probes cell (h1 + d·h2) mod width — the Kirsch–Mitzenmacher
    * double-hash family (same as the bloom pair), XXH64 seed 42 matching
    * Spark's `xxhash64`.
    */
  def add(v: Long, counts: Array[Long], width: Int, depth: Int): Unit = {
    val h1 = XXH64.hashLong(v, HashOps.Seed)
    val h2 = XXH64.hashLong(v, HashOps.Seed + 1) | 1L
    var d = 0
    while (d < depth) {
      val idx = (((h1 + d * h2) & Long.MaxValue) % width).toInt
      counts(d * width + idx) += 1
      d += 1
    }
  }

  /** Min over the key's depth cells — never below the true count. */
  def estimate(v: Long, counts: Array[Long], width: Int, depth: Int): Long = {
    val h1 = XXH64.hashLong(v, HashOps.Seed)
    val h2 = XXH64.hashLong(v, HashOps.Seed + 1) | 1L
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = (((h1 + d * h2) & Long.MaxValue) % width).toInt
      val c = counts(d * width + idx)
      if (c < min) min = c
      d += 1
    }
    min
  }

  /** [[CmsOrderExpr]]'s kernel: indices sorted by (estimate, hash)
    * ascending via an in-place dual-key quicksort over two parallel
    * primitive arrays — no boxing, no comparator allocation per row.
    *
    * Null elements FAIL LOUDLY: the analysis-time check can't see
    * containsNull (type acceptance ignores nullability), and getLong on
    * a null slot would fabricate hash 0 where the interpreted chain it
    * replaced propagated the null — producers here (shingle_hashes)
    * never emit null elements, so the branch is dead in practice and
    * the guard costs one bit-test per element.
    */
  def orderByEstimate(sh: org.apache.spark.sql.catalyst.util.ArrayData,
      counts: Array[Long], width: Int, depth: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = sh.numElements()
    val hs = new Array[Long](n)
    val dfs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (sh.isNullAt(i)) throw new IllegalArgumentException(
        s"cms_order: null element at index $i (expected array<bigint> with no null elements)")
      val h = sh.getLong(i)
      hs(i) = h
      dfs(i) = estimate(h, counts, width, depth)
      i += 1
    }
    sortPairs(dfs, hs, 0, n - 1)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hs)
  }

  /** In-place quicksort of (dfs, hs) pairs by (df, h) ascending; median-of-3
    * pivot, tail-call on the larger side bounds the stack at O(log n). */
  private def sortPairs(dfs: Array[Long], hs: Array[Long],
      lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 16) { // insertion sort for small runs
        var i = lo + 1
        while (i <= hi) {
          val d = dfs(i); val h = hs(i)
          var j = i - 1
          while (j >= lo && (dfs(j) > d || (dfs(j) == d && hs(j) > h))) {
            dfs(j + 1) = dfs(j); hs(j + 1) = hs(j); j -= 1
          }
          dfs(j + 1) = d; hs(j + 1) = h
          i += 1
        }
        return
      }
      // median-of-3 pivot moved to lo
      val mid = (lo + hi) >>> 1
      def less(a: Int, b: Int): Boolean =
        dfs(a) < dfs(b) || (dfs(a) == dfs(b) && hs(a) < hs(b))
      def swap(a: Int, b: Int): Unit = {
        val td = dfs(a); dfs(a) = dfs(b); dfs(b) = td
        val th = hs(a); hs(a) = hs(b); hs(b) = th
      }
      if (less(mid, lo)) swap(mid, lo)
      if (less(hi, lo)) swap(hi, lo)
      if (less(hi, mid)) swap(hi, mid)
      val pd = dfs(mid); val ph = hs(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (dfs(i) < pd || (dfs(i) == pd && hs(i) < ph)) i += 1
        while (dfs(j) > pd || (dfs(j) == pd && hs(j) > ph)) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse on the smaller side, loop on the larger
      if (j - lo < hi - i) { sortPairs(dfs, hs, lo, j); lo = i }
      else { sortPairs(dfs, hs, i, hi); hi = j }
    }
  }

  /** Probe a grid (serialized form) and return the row's hash array in
    * (df asc, hash asc) order — the PPJoin canonical order, fused. */
  def cmsOrder(key: Column, grid: Array[Byte], width: Int, depth: Int = 4): Column = {
    val longs = new Array[Long](grid.length >>> 3)
    java.nio.ByteBuffer.wrap(grid).asLongBuffer().get(longs)
    ColumnBridge.column(
      CmsOrderExpr(ColumnBridge.expression(key), longs, width, depth))
  }

  /** Aggregate a LongType key column into a serialized count grid. */
  def cmsState(key: Column, width: Int, depth: Int = 4): Column =
    ColumnBridge.column(
      CmsStateExpr(ColumnBridge.expression(key), width, depth)
        .toAggregateExpression())

  /** Probe a previously built grid (serialized form). */
  def cmsEstimate(key: Column, grid: Array[Byte], width: Int, depth: Int = 4): Column = {
    val longs = new Array[Long](grid.length >>> 3)
    java.nio.ByteBuffer.wrap(grid).asLongBuffer().get(longs)
    ColumnBridge.column(
      CmsEstimateExpr(ColumnBridge.expression(key), longs, width, depth))
  }
}
