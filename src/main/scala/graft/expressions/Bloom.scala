package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter as a mergeable aggregate + a codegen membership probe —
  * the explicit form of Spark's runtime-filter optimization, exposed as a
  * library operator so a pipeline can build the filter ONCE, persist it,
  * and prune many scans with it (AQE's `InjectRuntimeFilter` rebuilds per
  * query and only fires under size heuristics).
  *
  * Properties that make it safe at the exactness bar used here:
  *  - building is ORDER-INDEPENDENT (bitwise OR merge), so the serialized
  *    bitset is identical on any partitioning — deterministic;
  *  - a probe has NO FALSE NEGATIVES, so `filter(bloom_contains(k))`
  *    before an exact join never changes the join's result — the pattern
  *    `bloom-prune → exact semi-join` is verified against the PLAIN
  *    semi-join oracle (q28);
  *  - false positives only cost shuffled bytes; the rate is sized by
  *    numBits/numHashes (~n·10 bits for ~1% at 5 hashes).
  */
case class BloomStateExpr(child: Expression, numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_state expects BIGINT, got ${child.dataType.sql}")

  require(numBits >= 64 && (numBits & 63) == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1, "need at least one hash")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) HashOps.bloomSet(v.asInstanceOf[Long], buf, numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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
  override def prettyName: String = "bloom_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomStateExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomStateExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomStateExpr =
    copy(child = newChild)
}

/** Membership probe against a FIXED bitset (built previously, e.g. by
  * [[BloomStateExpr]] and collected/broadcast): stays inside whole-stage
  * codegen with the bitset as a reference object, one static call per row.
  */
case class BloomContainsExpr(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.bloomContains(input.asInstanceOf[Long], bits, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.bloomContains($c, $ref, $numHashes)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

object Bloom {

  /** Aggregate a LongType key column into a serialized bloom bitset. */
  def bloomState(key: Column, numBits: Int, numHashes: Int = 5): Column =
    ColumnBridge.column(
      BloomStateExpr(ColumnBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Probe a previously built bitset (serialized form). The probe derives
    * numBits from the byte length, so a truncated persisted filter would
    * probe DIFFERENT positions than the build did — false negatives, i.e.
    * silently dropped rows from the "exact" prune-then-join pattern. Reject
    * by name what the length can reveal (empty / non-multiple-of-8); an
    * 8-byte-aligned truncation is not detectable from the payload alone.
    */
  def bloomContains(key: Column, bits: Array[Byte], numHashes: Int = 5): Column = {
    if (bits.length < 8 || (bits.length & 7) != 0)
      throw new IllegalArgumentException(
        s"bloom bitset must be a positive multiple of 8 bytes, got ${bits.length} " +
          "(truncated or foreign filter — probing it would yield false negatives)")
    val longs = new Array[Long](bits.length >>> 3)
    java.nio.ByteBuffer.wrap(bits).asLongBuffer().get(longs)
    ColumnBridge.column(
      BloomContainsExpr(ColumnBridge.expression(key), longs, numHashes))
  }
}
