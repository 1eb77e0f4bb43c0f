package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` works cluster-wide via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * `GraftExtensions.register(spark)` does the same for an existing
  * session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))),
    (FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[graft.expressions.TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be a literal int, got $other")
        }
        graft.expressions.TopKByScore(exprs.head, exprs(1), k).toAggregateExpression()
      }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
