package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    extends UnaryExpression with CodegenFallback {

  require(planes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](planes)
    var p = 0
    while (p < planes) {
      val planeSeed = XXH64.hashInt(p, 42L)
      var dot = 0.0
      var anyNull = false
      var d = 0
      while (d < n && !anyNull) {
        if (arr.isNullAt(d)) anyNull = true
        else {
          val sign = if ((XXH64.hashInt(d, planeSeed) & 1L) == 1L) 1.0 else -1.0
          dot += arr.getFloat(d).toDouble * sign
          d += 1
        }
      }
      // HOF parity: a null element nulls the whole fold, and
      // `when(dot >= 0, 1).otherwise(0)` sends null to 0.
      out(p) = if (!anyNull && dot >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature"
}
