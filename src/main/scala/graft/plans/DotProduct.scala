package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: Σ aᵢ·bᵢ over two numeric vectors.
  *
  * This is the codegen'd core under `operators.Similarity.dot` (and,
  * squared, `Similarity.norm`). The zip_with/aggregate composition it
  * replaces is a higher-order function — Spark evaluates those lambdas
  * interpreted, one boxed call per element, plus an intermediate array
  * allocation per row-pair; the repo's own native-vs-composition cosine
  * twin measured that overhead at ~9×. The quantizer paths (IVF cell
  * assignment, PQ encode, per-query ADC tables) evaluate hundreds of
  * short dots per ROW, so they sit squarely on this constant.
  *
  * Semantics match the composition bit-for-bit on every call site:
  * elements widen to double and accumulate left-to-right (acc += x·y),
  * the same fp sequence as the interpreted fold and as the DuckDB
  * oracle's sequential list_sum — so hash-gated cosine scores are
  * unchanged. Each side may independently be array<float> or
  * array<double> (embeddings are float; centroid/hyperplane literals and
  * normalized subvectors are double), which the composition handled via
  * per-element casts.
  *
  * Deliberate narrowing vs the composition: unequal lengths dot the
  * common prefix (the composition nulled the whole result via zip_with
  * padding) and array elements must be non-null — no operator pairs
  * ragged or null-holed vectors.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"left must be array<float|double>, got ${left.dataType}")
    else if (elemType(right).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"right must be array<float|double>, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y; i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression) =
        if (elemType(side).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
