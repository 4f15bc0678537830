package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group top-k as a BOUNDED-HEAP aggregate.
  *
  * The window formulation (`row_number() over (partition by g order by v)
  * <= k`) materializes, shuffles and sorts EVERY row of every group; at
  * 100 TB that is a full-data exchange to keep k rows per group. This
  * aggregate keeps at most k (value, id) pairs per group per partition,
  * partial-aggregates map-side (ObjectHashAggregate), and shuffles only
  * those k-bounded states — the exchange carries O(groups × k), not O(n).
  *
  * Determinism: the order is total — value DESC then id ASC — so ties
  * cannot make the kept set depend on partitioning, and the result is
  * verifiable against the equivalent window SQL with the same tie-break.
  */
case class TopKAggExpr(value: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with BinaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (value.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k expects (DOUBLE, BIGINT), got (${value.dataType.sql}, ${id.dataType.sql})")
  }

  require(k >= 1, "top-k needs k >= 1")

  // value DESC, id ASC; the LAST element is the weakest kept entry.
  // Double ordering mirrors Spark SQL's (SQLOrderingUtil.compareDoubles):
  // `==` first so -0.0 ties 0.0, then Double.compare so NaN ranks GREATEST —
  // i.e. a NaN score is kept at rank 1, exactly where the row_number()
  // window oracle puts it. This must be a TOTAL order: the previous
  // fromLessThan comparator made NaN compare equal to EVERYTHING, violating
  // the TreeSet contract and silently dropping rows whenever a NaN value
  // (e.g. cosine of a zero-norm vector) entered the group.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val byValueDesc =
        if (a._1 == b._1) 0 else java.lang.Double.compare(b._1, a._1)
      if (byValueDesc != 0) byValueDesc
      else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def left: Expression = value
  override def right: Expression = id

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      buf.add((v.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Double, Long)],
      b2: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (v, id) = it.next()
      out(i) = InternalRow(v, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAggExpr =
    copy(value = newLeft, id = newRight)
}

object TopK {

  /** Top-k (value DESC, id ASC) pairs per group, as an array of
    * `{value, id}` structs in rank order.
    */
  def topK(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAggExpr(ColumnBridge.expression(value), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
