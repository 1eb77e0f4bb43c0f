package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Fused distinct word-k-shingles: equivalent to
  * `array_distinct(transform(sequence(0, n-k), i => concat_ws(" ",
  * slice(tokens, i+1, k))))` with the short-doc empty-array guard — one
  * pass, first-occurrence order preserved (bit-identical to the HOF
  * formulation), no interpreted lambda frames. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = Md5Hex.sparkTokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - k + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Fused winnowing fingerprints (MOSS rolling-hash scheme): md5 every
  * ordered k-shingle (duplicates kept), slide a window of w hashes, keep
  * each window's minimum, dedupe preserving first occurrence. The HOF
  * formulation (TextFunctions.winnowingFingerprintsHof) re-evaluates the
  * entire hash array inside every window lambda — interpreted lambdas do
  * no common-subexpression elimination, giving O(windows × shingles)
  * md5 calls; this is one pass with a sliding minimum. */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && w > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnowing_fingerprints expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = Md5Hex.sparkTokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val nh = toks.length - k + 1
    val hashes = new Array[String](nh)
    var i = 0
    while (i < nh) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      hashes(i) = Md5Hex.hex(md.digest(sb.toString.getBytes(StandardCharsets.UTF_8)))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    if (nh < w) {
      var min = hashes(0)
      var x = 1
      while (x < nh) { if (hashes(x).compareTo(min) < 0) min = hashes(x); x += 1 }
      seen.add(min)
    } else {
      var j = 0
      while (j <= nh - w) {
        // w is small (4-8): direct scan beats a monotonic deque here
        var min = hashes(j)
        var x = j + 1
        while (x < j + w) { if (hashes(x).compareTo(min) < 0) min = hashes(x); x += 1 }
        seen.add(min)
        j += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnowing_fingerprints"
}

/** Fused 64-bit SimHash over a token array: per-bit majority vote of
  * token xxhash64 values (seed 42 — the same `XXH64.hashUTF8String` the
  * built-in `xxhash64` uses, so this is bit-identical to the HOF
  * formulation in Dedup.simhash64Hof, which walks 64 interpreted lambda
  * frames per token). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    var e = 0
    val n = arr.numElements()
    while (e < n) {
      // null elements contribute no vote (the SQL-registered surface
      // accepts containsNull=true arrays; callers via WordShingles never
      // produce them)
      if (!arr.isNullAt(e)) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(e), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      e += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** 64-bit SimHash with an md5-derived hash family: token hash = the
  * first 8 digest bytes read big-endian (== the first 16 hex chars of
  * `md5(token)` parsed as an unsigned 64-bit value), per-bit majority
  * vote as in [[SimHash64]]. Unlike xxhash64, md5 is bit-identical in
  * every engine, so signatures — and therefore hamming-distance dedup
  * results — are DuckDB-oracle-able end to end (the oracle reassembles
  * the same bits from the md5 hex string). xxhash64 [[SimHash64]] stays
  * the production fast path.
  */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64_md5 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Long](64)
    var e = 0
    val n = arr.numElements()
    while (e < n) {
      if (!arr.isNullAt(e)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(e).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xFFL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      e += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64_md5"
}

/** Fused min-shingle-md5 fingerprint: equivalent to
  * `array_min(transform(shingles(text, k), s => md5(s)))` but one tight
  * pass — no intermediate shingle/hash arrays, no per-element Catalyst
  * lambda frames (HOFs are interpreted, not codegen'd). Same md5-hex
  * lexicographic-min semantics as the DuckDB oracle. */
case class MinShingleMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_shingle_md5 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = Md5Hex.sparkTokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < k) return null
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var min: String = null
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val h = Md5Hex.hex(md.digest(sb.toString.getBytes(StandardCharsets.UTF_8)))
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "min_shingle_md5"
}

/** Fused MinHash signature: equivalent to
  * `transform(sequence(0, n-1), i => array_min(transform(sh, s =>
  * md5(concat(i, '|', s)))))` — one pass over the shingle array updating
  * all n per-permutation minimums, instead of n interpreted HOF passes. */
case class MinHashSignatureMd5(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature_md5 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(numHashes)(i => s"$i|")
    var e = 0
    while (e < n) {
      // null shingles are skipped rather than NPE'ing — the direct-Column
      // surface doesn't restrict inputs to containsNull=false arrays
      if (!arr.isNullAt(e)) {
        val s = arr.getUTF8String(e).toString
        var i = 0
        while (i < numHashes) {
          md.reset()
          val h = Md5Hex.hex(md.digest((prefixes(i) + s).getBytes(StandardCharsets.UTF_8)))
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature_md5"
}
