package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension that exposes the native kernels to the SQL surface:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  *   SELECT cosine_sim(embedding, query_vec) FROM embeddings
  * }}}
  *
  * The same registration can be applied to a live session with
  * [[GraftExtensions.register]] (extensions configured via conf only take
  * effect at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimFunction)
    ext.injectFunction(GraftExtensions.normalizeTextFunction)
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triple for `cosine_sim(a, b)`. */
  val cosineSimFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
      CosineSimilarity(args.head, args(1))
    })

  /** (identifier, info, builder) for `normalize_text(s[, 'NFC'])`; the
    * form argument must be a foldable string literal. */
  val normalizeTextFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("normalize_text"),
    new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
    (args: Seq[Expression]) => args match {
      case Seq(s) => NormalizeText(s, "NFC")
      case Seq(s, f) if f.foldable =>
        NormalizeText(s, f.eval().toString)
      case _ => throw new IllegalArgumentException(
        "normalize_text expects (string[, literal form])")
    })

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    Seq(cosineSimFunction, normalizeTextFunction).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }
}
