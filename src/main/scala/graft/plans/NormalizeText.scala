package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native, codegen'd Catalyst expression —
  * the canonicalization step a multilingual 100 TB corpus needs before
  * any hash-based dedup or tokenization (the same logical text can
  * arrive as composed U+00E9 or decomposed U+0065 U+0301; every digest
  * operator in this engine would treat those as different documents).
  *
  * Spark ships no Unicode-normalize function, and the house rule is
  * zero UDFs (SURVEY §2.10): like [[CosineSimilarity]], this goes
  * native instead — `java.text.Normalizer` (ICU-equivalent for the
  * normalization forms, part of the JDK) invoked from generated code,
  * staying inside whole-stage codegen. Map-only, no state; NFC/NFKC
  * choose composition vs compatibility folding (NFKC also folds
  * ligatures/width variants — the aggressive pre-tokenization choice).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  require(form == "NFC" || form == "NFD" || form == "NFKC" || form == "NFKD",
    s"unsupported normalization form $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Column-level entry point. */
  def normalizeText(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c), form))

  /** Accent strip: decompose (NFD), drop combining marks. Composes the
    * native expression with the built-in regexp (both codegen'd). */
  def stripAccents(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(
      normalizeText(c, "NFD"), "\\p{M}", "")
}
