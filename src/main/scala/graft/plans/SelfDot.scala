package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ xᵢ² as a UNARY kernel — what `dot(x, x)` evaluates, with one array
  * read per element instead of two. The operators never construct this
  * directly: [[SelfDotRule]] (a Catalyst optimizer rule injected via
  * [[GraftExtensions]]) rewrites `DotProduct(a, b)` where both sides are
  * the SAME expression into `SelfDot(a)` — the norm legs under every
  * cosine path get the fused form for free, and a plan that stops
  * qualifying (e.g. the two sides diverge) silently keeps the general
  * kernel. Accumulation is the identical fp sequence (acc += x·x,
  * left-to-right), so results are bit-equal to the binary kernel and
  * every existing hash gate is unaffected (spec-pinned).
  */
case class SelfDot(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"self_dot expects array<float|double>, got $other")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val f = isFloat
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x; i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      val get =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get;
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SelfDot =
    copy(child = newChild)
}

/** Optimizer rule: `DotProduct(x, x)` → `SelfDot(x)` when both sides
  * are semantically the same deterministic expression. */
object SelfDotRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfDot(a)
    }
}
