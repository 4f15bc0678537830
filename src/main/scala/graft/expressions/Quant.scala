package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric int8 embedding quantization — the memory/bandwidth lever for
  * ANN at 100 TB: a float32 corpus vector stores as `dim` bytes + one
  * double scale (≈4× smaller), and candidate scoring becomes an integer
  * dot product with one float multiply at the end:
  *
  *   score(a, b) ≈ dot_int8(qa, qb) · scale_a · scale_b
  *
  * Quantization is per-vector symmetric: scale = max|x|/127,
  * q_i = clamp(floor(x_i/scale + 0.5), -127, 127) — deterministic (no
  * RNG, no data-dependent calibration), so quantized vectors, scores and
  * rankings are pure functions of the input, reproducible on any
  * partitioning, and the integer dot is EXACTLY representable in a
  * double (|dot| ≤ 127²·dim ≪ 2^53) — which is what lets a relational
  * oracle replay s5's ranking with zero tolerance.
  */
object Quant {

  private def scaleOf(x: Array[Float]): Double = {
    var m = 0.0
    var i = 0
    while (i < x.length) {
      val a = math.abs(x(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    if (m == 0.0) 1.0 else m / 127.0
  }

  def quantScale(v: ArrayData): Double = scaleOf(HashOps.floats(v))

  def quantBytes(v: ArrayData): Array[Byte] = {
    val x = HashOps.floats(v)
    val s = scaleOf(x)
    val out = new Array[Byte](x.length)
    var i = 0
    while (i < x.length) {
      val q = math.floor(x(i).toDouble / s + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  /** The quantized values as ints — the oracle-dump form of [[quantBytes]]
    * (bit-equal values, spec-pinned; parquet has no int8).
    */
  def quantInts(v: ArrayData): ArrayData = {
    val b = quantBytes(v)
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toInt; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  def scale(v: Column): Column =
    ColumnBridge.column(QuantScaleExpr(ColumnBridge.expression(v)))
  def bytes(v: Column): Column =
    ColumnBridge.column(QuantBytesExpr(ColumnBridge.expression(v)))
  def ints(v: Column): Column =
    ColumnBridge.column(QuantIntsExpr(ColumnBridge.expression(v)))
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8DotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class QuantScaleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quant_scale"
  override protected def nullSafeEval(v: Any): Any =
    Quant.quantScale(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Quant.quantScale($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantScaleExpr =
    copy(child = newChild)
}

case class QuantBytesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quant_bytes"
  override protected def nullSafeEval(v: Any): Any =
    Quant.quantBytes(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Quant.quantBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantBytesExpr =
    copy(child = newChild)
}

case class QuantIntsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quant_ints"
  override protected def nullSafeEval(v: Any): Any =
    Quant.quantInts(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Quant.quantInts($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantIntsExpr =
    copy(child = newChild)
}

case class Int8DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Quant.int8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Quant.int8Dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8DotExpr =
    copy(left = newLeft, right = newRight)
}
