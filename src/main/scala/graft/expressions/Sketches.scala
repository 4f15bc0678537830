package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sketch aggregates (SURVEY §2 H north-star: custom UDAF via
  * `TypedImperativeAggregate` — the Catalyst extension class for
  * aggregates whose state is an object, not a fixed-width row).
  *
  * [[KmvDistinctExpr]] is the KMV (k-minimum-values) distinct-count
  * sketch (Bar-Yossef et al. 2002): keep the k smallest distinct hash
  * values seen; if the k-th smallest sits at normalized position u in the
  * hash space, about k/u distinct values exist — the estimator
  * `(k-1)/u_k` is unbiased. Properties that matter here:
  *
  *  - MERGEABLE: the union's k smallest = k smallest of the merged kept
  *    sets, so partial aggregation and shuffle-merge are exact — the
  *    sketch state is tiny (k longs) regardless of input size;
  *  - DETERMINISTIC: no RNG anywhere — the estimate is a pure function
  *    of the input's hash set, identical on any partitioning, rerun, or
  *    engine. Unlike HLL, the whole aggregate is therefore verifiable by
  *    an EXTERNAL ORACLE recomputing k-th-smallest relationally (t8);
  *  - exact below k: fewer than k distinct hashes → the state IS the
  *    distinct set and the exact count returns.
  *
  * Ordering is SIGNED long order with the affine normalization
  * `u = (h + 2^63) / 2^64` ∈ (0, 1) — a rotation of the hash space,
  * harmless for uniform hashes and trivially mirrored in SQL.
  */
case class KmvDistinctExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Sketches.estimate(buf, k)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    Sketches.pack(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    Sketches.unpack(bytes)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctExpr =
    copy(child = newChild)
}

/** Build the SKETCH ITSELF as a value: same state machine as
  * [[KmvDistinctExpr]] but evaluating to the serialized kept-set — the
  * persistable form. A pipeline sketches once at ingest (e.g. per
  * source×day), stores the k-long binary, and any later rollup
  * re-aggregates sketches instead of rescanning data
  * ([[KmvMergeEstimateExpr]]); KMV merge is exact, so the rolled-up
  * estimate is IDENTICAL to sketching the union directly.
  */
case class KmvStateExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k >= 2, "kmv sketch needs k >= 2")
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }
  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = serialize(buf)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    Sketches.pack(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    Sketches.unpack(bytes)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_state"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvStateExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvStateExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvStateExpr =
    copy(child = newChild)
}

/** Roll up serialized KMV sketches (BinaryType column from
  * [[KmvStateExpr]]) and evaluate the merged estimate — the serve-time
  * half of the sketch-once / roll-up-many pattern.
  */
case class KmvMergeEstimateExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k >= 2, "kmv sketch needs k >= 2")
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.addAll(Sketches.unpack(v.asInstanceOf[Array[Byte]]))
      while (buf.size > k) buf.pollLast()
    }
    buf
  }
  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Sketches.estimate(buf, k)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    Sketches.pack(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    Sketches.unpack(bytes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge_estimate"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeEstimateExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeEstimateExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeEstimateExpr =
    copy(child = newChild)
}

/** Intersection ESTIMATE between two serialized KMV sketches — the
  * theta-sketch set operation: θ = the smaller of the two sketches' k-th
  * values (a side below k contributes the Long.MaxValue sentinel, whose
  * normalization is EXACTLY 1.0 — so the formula needs no small-set
  * branch and degenerates to the exact intersection count when both
  * sides kept everything); the estimate is |{h ∈ A∩B : h < θ}| / u(θ).
  * Deterministic like the rest of the family, hence exact-oracle-able.
  */
case class KmvIntersectExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 2, "kmv sketch needs k >= 2")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.intersectEstimate(
      Sketches.unpack(a.asInstanceOf[Array[Byte]]),
      Sketches.unpack(b.asInstanceOf[Array[Byte]]), k)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** Set-DIFFERENCE estimate |A \ B| between two serialized KMV sketches —
  * the theta-sketch "AnotB" operation: θ = min of the two k-th values;
  * the estimate is |{h ∈ A's kept set : h < θ, h ∉ B's kept set}| / u(θ).
  * Membership against B's kept set is exact below θ (θ ≤ B's own
  * threshold, and every B-hash below that threshold is kept), so like
  * intersection this degenerates to the exact difference count when both
  * sides kept everything. Deterministic, hence exact-oracle-able.
  */
case class KmvDifferenceExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 2, "kmv sketch needs k >= 2")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_difference"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.differenceEstimate(
      Sketches.unpack(a.asInstanceOf[Array[Byte]]),
      Sketches.unpack(b.asInstanceOf[Array[Byte]]), k)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvDifferenceExpr =
    copy(left = newLeft, right = newRight)
}

object Sketches {

  private[expressions] def differenceEstimate(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long], k: Int): Double = {
    val ta = if (a.size >= k) a.last.longValue else Long.MaxValue
    val tb = if (b.size >= k) b.last.longValue else Long.MaxValue
    val t = math.min(ta, tb)
    var c = 0
    a.headSet(java.lang.Long.valueOf(t), false)
      .forEach(h => if (!b.contains(h)) c += 1)
    c.toDouble / ((t.toDouble + 9.223372036854776E18) / 1.8446744073709552E19)
  }

  private[expressions] def intersectEstimate(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long], k: Int): Double = {
    val ta = if (a.size >= k) a.last.longValue else Long.MaxValue
    val tb = if (b.size >= k) b.last.longValue else Long.MaxValue
    val t = math.min(ta, tb)
    var c = 0
    a.headSet(java.lang.Long.valueOf(t), false)
      .forEach(h => if (b.contains(h)) c += 1)
    // Long.MaxValue.toDouble rounds to exactly 2^63, so u(sentinel) = 1.0
    c.toDouble / ((t.toDouble + 9.223372036854776E18) / 1.8446744073709552E19)
  }

  private[expressions] def pack(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  /** Inverse of [[pack]]. The count header is validated against the byte
    * length because sketches are PERSISTED values re-read by
    * [[KmvMergeEstimateExpr]]/[[KmvIntersectExpr]] — a truncated or foreign
    * binary must fail by name, not underflow the buffer (header > payload)
    * or silently act as an EMPTY sketch (negative header), which would
    * corrupt every rollup estimate it merges into.
    */
  private[expressions] def unpack(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    if (bytes.length < 4)
      throw new IllegalArgumentException(
        s"corrupt kmv sketch: ${bytes.length} bytes (need a 4-byte count header)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0 || bytes.length != 4 + 8L * n)
      throw new IllegalArgumentException(
        s"corrupt kmv sketch: header says $n hashes but payload is ${bytes.length - 4} bytes")
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  private[expressions] def estimate(buf: java.util.TreeSet[java.lang.Long], k: Int): Double =
    if (buf.size < k) buf.size.toDouble
    else {
      val hk = buf.last.longValue.toDouble
      (k - 1).toDouble / ((hk + 9.223372036854776E18) / 1.8446744073709552E19)
    }

  /** KMV distinct-count estimate over a long hash column. */
  def kmvDistinct(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinctExpr(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** Serialized KMV sketch of a long hash column (persistable state). */
  def kmvState(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvStateExpr(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** Merged estimate over a column of serialized KMV sketches. */
  def kmvMergeEstimate(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeEstimateExpr(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Intersection estimate between two serialized KMV sketch columns. */
  def kmvIntersect(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(
      KmvIntersectExpr(ColumnBridge.expression(a), ColumnBridge.expression(b), k))

  /** Set-difference estimate |a \ b| between two serialized KMV sketch
    * columns (theta-sketch AnotB).
    */
  def kmvDifference(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDifferenceExpr(ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}
