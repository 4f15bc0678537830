package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-tokens histogram as ONE codegen kernel call — the
  * feature extractor behind the learned quality filter
  * ([[graft.text.QualityModel]]). Semantics are bit-equal to the
  * declarative form
  * `transform(sequence(0, dim-1), d -> size(filter(buckets, b = d)))`
  * over `pmod(xxhash64(token), dim)` buckets (spec-pinned), but the
  * kernel walks the tokens once instead of scanning them `dim` times
  * through the lambda interpreter — on the corpus feature path that is
  * the difference between O(tokens) and O(dim·tokens) per row.
  */
case class TokenBucketsExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 4096, "dim must be in [1, 4096]")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_buckets expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_buckets"
  override protected def nullSafeEval(v: Any): Any =
    TokenBuckets.histogram(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TokenBuckets.histogram($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): TokenBucketsExpr =
    copy(child = newChild)
}

object TokenBuckets {

  /** One pass: hash each non-empty space-separated token with Spark's
    * own xxhash64 (seed 42 — identical to the `xxhash64` SQL function)
    * and count per pmod bucket.
    */
  def histogram(text: UTF8String, dim: Int): UnsafeArrayData = {
    val counts = new Array[Long](dim)
    val toks = text.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), HashOps.Seed)
        val b = ((h % dim) + dim) % dim
        counts(b.toInt) += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  def tokenBuckets(text: Column, dim: Int): Column =
    ColumnBridge.column(TokenBucketsExpr(ColumnBridge.expression(text), dim))
}
