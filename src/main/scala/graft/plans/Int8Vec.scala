package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Native kernels for the int8 SERVING layout: embeddings stored as
  * 64-byte code vectors (4× smaller than float32 on disk and on the
  * scan), scored with pure integer dot products.
  *
  * Why integer scoring is enough for cosine serving: with symmetric
  * per-vector quantization `x ≈ s·q`, the scales cancel —
  * cos(s_a·q_a, s_b·q_b) = Σq_aq_b / (‖q_a‖·‖q_b‖) — so ranking needs
  * only code dots, never the scale or a dequantized float vector. And
  * because int8 dots are EXACT integers (max 127²·d, no rounding), the
  * whole score is deterministic: any summation order gives the same
  * long, sqrt/division are single exactly-rounded IEEE ops — which is
  * what lets `sim_int8_topk` carry a full DuckDB hash gate.
  */
object Int8Vec {

  /** `int8_codes(vec)`: one fused pass — maxabs → scale = maxabs/127 →
    * bytes round-half-away(xᵢ/scale) — emitting the packed signed-byte
    * array. Rounding matches [[QuantReconstruct]] bit-for-bit (same
    * rint-plus-tie-patch), so `codes·scale` reproduces exactly the
    * vectors [[QuantReconstruct]] builds. */
  case class Int8Codes(child: Expression) extends UnaryExpression {

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

    override def dataType: DataType = BinaryType

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      val f = isFloat
      var maxAbs = 0.0
      var i = 0
      while (i < n) {
        val x = math.abs(if (f) a.getFloat(i).toDouble else a.getDouble(i))
        if (x > maxAbs) maxAbs = x
        i += 1
      }
      val scale = maxAbs / 127.0
      val out = new Array[Byte](n)
      if (scale != 0.0) {
        i = 0
        while (i < n) {
          val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
          out(i) = QuantReconstruct.roundAway(x / scale).toByte
          i += 1
        }
      }
      out
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
           |byte[] $out = new byte[$n];
           |if ($scale != 0.0) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $get / $scale;
           |    double $r = java.lang.Math.rint($x);
           |    double $d = $x - $r;
           |    if ($d == 0.5) $r += 1.0; else if ($d == -0.5) $r -= 1.0;
           |    $out[$i] = (byte) $r;
           |  }
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Int8Codes =
      copy(child = newChild)
  }

  /** `int8_dot(a, b)`: Σ aᵢ·bᵢ over two signed-byte arrays, exact long
    * accumulation over the common prefix. */
  case class Int8Dot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType != BinaryType || right.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"int8_dot expects (binary, binary), got (${left.dataType}, ${right.dataType})")
      else TypeCheckResult.TypeCheckSuccess

    override def dataType: DataType = LongType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Array[Byte]]
      val b = r.asInstanceOf[Array[Byte]]
      val n = math.min(a.length, b.length)
      var acc = 0L; var i = 0
      while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
      java.lang.Long.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.length, $b.length);
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (long) $a[$i] * (long) $b[$i];
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8Dot =
      copy(left = newLeft, right = newRight)
  }

  /** Column-level entry points. */
  def codes(a: Column): Column =
    ColumnBridge.column(Int8Codes(ColumnBridge.expression(a)))
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      Int8Dot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
