package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-empty whitespace-token count as ONE codegen kernel call — the
  * fused form of the library idiom
  * `size(filter(split(text, " "), w -> length(w) > 0))`, which the
  * interpreter otherwise evaluates as: materialize the full token array,
  * run the lambda per ELEMENT through `ArrayFilter`'s interpreted path,
  * materialize the filtered array, take its size. The kernel is a single
  * pass over the string's bytes counting maximal non-space runs —
  * identical semantics (split(" ") produces one empty part per adjacent
  * separator pair; filtering empties leaves exactly the non-space runs),
  * no allocation.
  */
case class NonEmptyTokenCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nonempty_token_count expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nonempty_token_count"
  override protected def nullSafeEval(v: Any): Any =
    FuseTokenCount.countRuns(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.FuseTokenCount.countRuns($c)")
  override protected def withNewChildInternal(newChild: Expression): NonEmptyTokenCountExpr =
    copy(child = newChild)
}

/** Optimizer rule fusing the `size(filter(split(text, " "), w ->
  * length(w) > 0))` pattern into [[NonEmptyTokenCountExpr]] — the
  * library-level analog of Spark's own expression-simplification rules,
  * injected through `SparkSessionExtensions.injectOptimizerRule` so every
  * query written in the idiomatic declarative form (t14/t16/t17/t20 all
  * use it) gets the fused kernel without touching its source. Strictly
  * semantics-preserving: it only fires on EXACTLY the single-space
  * split + positive-length filter shape, leaving every other
  * split/filter/size composition alone (spec-pinned, including the
  * rule-off bit-equality).
  */
object FuseTokenCount extends Rule[LogicalPlan] {

  /** Count maximal non-space runs in one byte pass. */
  def countRuns(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var count = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == ' '.toByte) inRun = false
      else if (!inRun) { count += 1; inRun = true }
      i += 1
    }
    count
  }

  private def isSingleSpace(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, StringType) => s.toString == " "
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(
            ArrayFilter(
              StringSplit(str, sep, Literal(-1, _)),
              LambdaFunction(
                GreaterThan(Length(v: NamedLambdaVariable), Literal(0, _)),
                Seq(arg: NamedLambdaVariable), _)), _)
          if isSingleSpace(sep) && v.exprId == arg.exprId =>
        NonEmptyTokenCountExpr(str)
    }
}
