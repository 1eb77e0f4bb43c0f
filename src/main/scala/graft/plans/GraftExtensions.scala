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

  /** Friendly arity gate: a wrong-arity SQL call must fail with a usage
    * message at analysis time, not an IndexOutOfBoundsException from a
    * bare exprs(n). */
  private def arity(name: String, usage: String, exprs: Seq[Expression],
      min: Int, max: Int): Unit =
    if (exprs.size < min || exprs.size > max)
      throw new IllegalArgumentException(
        s"$name expects ${if (min == max) s"$min" else s"$min to $max"} " +
          s"arguments, got ${exprs.size}; usage: $usage")

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        arity("cosine_similarity", "cosine_similarity(a, b)", exprs, 2, 2)
        CosineSimilarity(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[graft.expressions.TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => {
        arity("topk_by_score", "topk_by_score(score, id, k)", exprs, 3, 3)
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null && v.toString.matches("-?\\d+") =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be a non-null literal int, got $other")
        }
        graft.expressions.TopKByScore(exprs.head, exprs(1), k).toAggregateExpression()
      }),
    (FunctionIdentifier("from_avro_confluent"),
      new ExpressionInfo(classOf[graft.avro.AvroDecode].getName, "from_avro_confluent"),
      (exprs: Seq[Expression]) => {
        arity("from_avro_confluent",
          "from_avro_confluent(bytes, schemaJson[, mode])", exprs, 2, 3)
        graft.avro.AvroDecode(
          exprs.head, stringLit(exprs(1), "from_avro_confluent schema"),
          permissive = exprs.lift(2).exists(e =>
            // accept the Spark-conventional mode names alongside booleans
            stringLit(e, "from_avro_confluent mode").toLowerCase match {
              case "true" | "permissive" => true
              case "false" | "failfast" => false
              case other => throw new IllegalArgumentException(
                "from_avro_confluent mode must be one of " +
                  s"PERMISSIVE/FAILFAST/true/false, got '$other'")
            }))
      }),
    (FunctionIdentifier("to_avro_confluent"),
      new ExpressionInfo(classOf[graft.avro.AvroEncode].getName, "to_avro_confluent"),
      (exprs: Seq[Expression]) => {
        arity("to_avro_confluent",
          "to_avro_confluent(struct, schemaJson[, schemaId])", exprs, 2, 3)
        graft.avro.AvroEncode(
          exprs.head, stringLit(exprs(1), "to_avro_confluent schema"),
          schemaId = exprs.lift(2).map(stringLit(_, "to_avro_confluent id").toInt).getOrElse(1))
      }),
    (FunctionIdentifier("avro_schema_id"),
      new ExpressionInfo(classOf[graft.avro.AvroFrameSchemaId].getName, "avro_schema_id"),
      (exprs: Seq[Expression]) => {
        arity("avro_schema_id", "avro_schema_id(bytes)", exprs, 1, 1)
        graft.avro.AvroFrameSchemaId(exprs.head)
      }))

  /** SQL-surface args that must be compile-time literals (schema JSON,
    * mode flags) — mirrors how spark-avro's SQL registration treats its
    * schema argument. */
  private def stringLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a non-null literal, got $other")
  }

  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
