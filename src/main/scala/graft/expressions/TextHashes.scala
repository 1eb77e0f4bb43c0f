package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

private[expressions] object Md5Hex {
  private val digits = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = digits((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = digits(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Mirror of Spark `trim` (strips 0x20 spaces only) + `split("\\s+")`
    * (Java regex, limit -1) — the exact tokenization of
    * TextFunctions.tokens, so fused and HOF paths are bit-identical. */
  def sparkTokens(text: String): Array[String] = {
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    text.substring(start, end).split("\\s+", -1)
  }
}

/** The fused text-hash expressions. Each kernel lives as a static method
  * in [[TextHashOps]]; interpreted eval and `doGenCode` both call it, so
  * the expression participates in whole-stage codegen (one static call
  * per row) instead of demoting its projection via CodegenFallback.
  * Semantics documentation:
  *
  *  - WordShingles: distinct word-k-shingles, equivalent to
  *    `array_distinct(transform(sequence(0, n-k), i => concat_ws(" ",
  *    slice(tokens, i+1, k))))` with a short-doc empty-array guard;
  *    first-occurrence order (bit-identical to the HOF formulation).
  *  - WinnowingFingerprints: MOSS rolling-hash scheme — md5 every
  *    ordered k-shingle (duplicates kept), slide a window of w hashes,
  *    keep each window's min, dedupe preserving first occurrence. The
  *    HOF reference re-hashes the entire shingle array per window
  *    (interpreted lambdas do no CSE): O(windows × shingles) md5 calls.
  *  - MinShingleMd5: lexicographic min of shingle md5s (1-perm minhash).
  *  - MinHashSignatureMd5: sig(i) = min over shingles of md5("i|" + s),
  *    one pass updating all perm minimums.
  *  - SimHash64: per-bit majority vote of token xxhash64 values
  *    (seed 42 — the same XXH64.hashUTF8String the built-in uses).
  *  - SimHash64Md5: md5-family SimHash — token hash = first 8 digest
  *    bytes big-endian; engine-neutral, so hamming-dedup results are
  *    DuckDB-oracle-able end to end (the oracle rebuilds the same bits
  *    from md5 hex nibbles). xxhash64 SimHash64 is the fast path.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.wordShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnowing_fingerprints expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.winnowingFingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.winnowingFingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnowing_fingerprints"
}

case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHashOps.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

case class SimHash64Md5(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64_md5 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHashOps.simhash64Md5(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.simhash64Md5($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64_md5"
}

case class MinShingleMd5(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_shingle_md5 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.minShingleMd5(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // result is null for docs shorter than k tokens
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.TextHashOps.minShingleMd5($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "min_shingle_md5"
}

case class MinHashSignatureMd5(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature_md5 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashOps.minhashSignatureMd5(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashOps.minhashSignatureMd5($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature_md5"
}
