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
