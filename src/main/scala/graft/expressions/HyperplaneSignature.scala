package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused random-hyperplane LSH signature over an `array<float>` vector:
  * bit p = sign of v · h_p, where plane p's ±1 components come from the
  * same xxhash64 chain the HOF reference uses
  * (`VectorFunctions.hyperplaneSignatureHof`): seed 42 → hashInt(plane)
  * → hashInt(dim), low bit picks the sign — so fused and HOF signatures
  * are bit-identical (spec-asserted).
  *
  * The HOF formulation runs `planes` interpreted `aggregate` lambdas per
  * row, each walking the vector with a per-element xxhash64 expression
  * tree — planes × dim interpreted frames per row. This is one tight
  * two-level loop; at corpus scale the signature pass is the scan-side
  * cost of every LSH operator (Similarity.lshTopK / knnJoinLsh).
  */
case class HyperplaneSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.hyperplaneSignature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.hyperplaneSignature($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature"
}

/** md5-parity twin of [[HyperplaneSignature]]: plane components from
  * md5("hp|p|d") hex parity instead of xxhash64, so the resulting LSH
  * bucket assignment is recomputable in DuckDB SQL — the trick that
  * turns approximate LSH operators into fully oracle-checked queries
  * (same move as SimHash64Md5). xxhash64 remains the fast path. */
case class HyperplaneSignatureMd5(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature_md5 expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.hyperplaneSignatureMd5(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.hyperplaneSignatureMd5($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature_md5"
}
