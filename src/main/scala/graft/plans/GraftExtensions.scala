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
    ext.injectFunction(GraftExtensions.int8CodesFunction)
    ext.injectFunction(GraftExtensions.int8DotFunction)
    ext.injectFunction(GraftExtensions.jaroWinklerFunction)
    // dot(x, x) → fused self-dot kernel (one array read per element)
    ext.injectOptimizerRule(_ => SelfDotRule)
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

  /** (identifier, info, builder) for `int8_codes(vec)` — the int8
    * serving-layout encoder ([[Int8Vec.Int8Codes]]). */
  val int8CodesFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("int8_codes"),
    new ExpressionInfo(classOf[Int8Vec.Int8Codes].getName, "int8_codes"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"int8_codes expects 1 argument, got ${args.length}")
      Int8Vec.Int8Codes(args.head)
    })

  /** (identifier, info, builder) for `int8_dot(a, b)` — exact integer
    * dot over two code vectors ([[Int8Vec.Int8Dot]]). */
  val int8DotFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("int8_dot"),
    new ExpressionInfo(classOf[Int8Vec.Int8Dot].getName, "int8_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"int8_dot expects 2 arguments, got ${args.length}")
      Int8Vec.Int8Dot(args.head, args(1))
    })

  /** (identifier, info, builder) for `jaro_winkler(a, b)` — the fuzzy
    * name-match scorer ([[JaroWinkler]]), DuckDB-identical semantics. */
  val jaroWinklerFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"jaro_winkler expects 2 arguments, got ${args.length}")
      JaroWinkler(args.head, args(1))
    })

  /** Register the functions AND the self-dot optimizer rule on an
    * already-running session (conf-time extensions only apply at session
    * construction; `experimental.extraOptimizations` is the documented
    * live-session hook for optimizer rules). Idempotent. */
  def register(spark: SparkSession): Unit = {
    Seq(cosineSimFunction, normalizeTextFunction,
        int8CodesFunction, int8DotFunction, jaroWinklerFunction).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SelfDotRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotRule
  }
}
