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
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimFunction)
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

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = cosineSimFunction
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
