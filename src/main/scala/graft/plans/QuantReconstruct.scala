package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the int8 round-trip of a vector in one
  * pass — `round(xᵢ/scale)·scale` with `scale = max|x|/127`
  * ([[graft.operators.Quant]] documents the quantizer itself).
  *
  * Replaces three interpreted higher-order functions per corpus row in
  * the quantized-top-k path (cast transform, abs transform for the max,
  * reconstruct transform) with one fused loop — the same
  * composition-to-kernel move as [[DotProduct]], and the same ~9×
  * per-element constant recovered.
  *
  * Bit-exactness contract (shared with the DuckDB twin, which the
  * oracle gate re-proves at every run):
  *  - elements widen to double exactly (float → double is exact);
  *  - scale = maxabs/127 — a max then one division, order-independent;
  *  - rounding is half-AWAY-from-zero on the binary double, computed as
  *    `rint` (exact, half-to-even) patched at the two exact-tie
  *    residuals ±0.5. For |x| < 2⁵² the residual x − rint(x) is an
  *    EXACT subtraction (operands within an ulp-scale of each other),
  *    so the tie test is precise; at |x| ≥ 2⁵² every double is already
  *    an integer and the residual is 0. This reproduces Spark's
  *    `round()` (BigDecimal HALF_UP over the shortest-decimal
  *    representation, which preserves half-integer ordering) without
  *    the per-element Double.toString/BigDecimal allocation, and
  *    matches DuckDB's std::round ties-away semantics directly.
  *  - the all-zero vector reconstructs to zeros (scale 0 guard).
  */
case class QuantReconstruct(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"child must be array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Double](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = QuantReconstruct.roundAway(x / scale) * scale
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs"); val scale = ctx.freshName("scale")
      val x = ctx.freshName("x"); val r = ctx.freshName("r")
      val d = ctx.freshName("d"); val out = ctx.freshName("out")
      val get =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($get);
         |  if ($x > $maxAbs) $maxAbs = $x;
         |}
         |double $scale = $maxAbs / 127.0;
         |double[] $out = new double[$n];
         |if ($scale != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get / $scale;
         |    double $r = java.lang.Math.rint($x);
         |    double $d = $x - $r;
         |    if ($d == 0.5) $r += 1.0; else if ($d == -0.5) $r -= 1.0;
         |    $out[$i] = $r * $scale;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantReconstruct =
    copy(child = newChild)
}

object QuantReconstruct {

  /** Round half away from zero, bit-identical to Spark's `round()` on
    * double and DuckDB's `round()` — see the class doc for why the
    * rint-plus-exact-tie-patch is safe. */
  def roundAway(x: Double): Double = {
    val r = math.rint(x)
    val d = x - r
    if (d == 0.5) r + 1.0 else if (d == -0.5) r - 1.0 else r
  }

  /** Column-level entry point. */
  def reconstructNative(a: Column): Column =
    ColumnBridge.column(QuantReconstruct(ColumnBridge.expression(a)))
}
