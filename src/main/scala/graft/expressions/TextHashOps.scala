package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM implementations of the fused text-hash kernels, shared by
  * interpreted eval and generated code. A top-level Scala object gets
  * static forwarders, so whole-stage codegen calls
  * `graft.expressions.TextHashOps.xxx(...)` directly — one static call
  * per row instead of demoting the whole projection to interpreted mode
  * (which is what a CodegenFallback expression does to every OTHER
  * expression in its stage).
  */
object TextHashOps {

  def wordShingles(input: UTF8String, k: Int): ArrayData = {
    val toks = Md5Hex.sparkTokens(input.toString)
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

  def winnowingFingerprints(input: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = Md5Hex.sparkTokens(input.toString)
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

  /** Null when the doc has fewer than k tokens. */
  def minShingleMd5(input: UTF8String, k: Int): UTF8String = {
    val toks = Md5Hex.sparkTokens(input.toString)
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

  def minhashSignatureMd5(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    val md = MessageDigest.getInstance("MD5")
    var e = 0
    while (e < n) {
      // null shingles are skipped rather than NPE'ing — the direct-Column
      // surface doesn't restrict inputs to containsNull=false arrays
      if (!arr.isNullAt(e)) {
        val s = arr.getUTF8String(e).toString
        var i = 0
        while (i < numHashes) {
          md.reset()
          val h = Md5Hex.hex(md.digest((i.toString + "|" + s).getBytes(StandardCharsets.UTF_8)))
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)).asInstanceOf[Array[Any]])
  }

  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Long](64)
    var e = 0
    val n = arr.numElements()
    while (e < n) {
      // null elements contribute no vote
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
    sig
  }

  def simhash64Md5(arr: ArrayData): Long = {
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
    sig
  }

  /** ±1 plane components from md5 parity — engine-neutral, so LSH bucket
    * assignments are reproducible in SQL on any engine with md5():
    * sign(p,d) = +1 iff the first hex char of md5("hp|p|d") has an odd
    * ASCII code (balanced: 8 of the 16 hex chars are odd). The matrix is
    * row-independent, so it's computed once per (planes, dim) and cached
    * process-wide — the per-row cost is the plain dot products. */
  private val md5PlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def md5PlaneMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    md5PlaneCache.computeIfAbsent((planes, dim), { key =>
      val (np, nd) = key
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(np) { p =>
        Array.tabulate(nd) { d =>
          md.reset()
          val h = Md5Hex.hex(md.digest(s"hp|$p|$d".getBytes(StandardCharsets.UTF_8)))
          if (h.charAt(0).toInt % 2 == 1) 1.0 else -1.0
        }
      }
    })

  /** md5-family twin of [[hyperplaneSignature]]: identical banding
    * semantics, DuckDB-oracle-able bits. Dot accumulates in index order
    * (bit-identical to a sequential SQL list_dot_product fold). */
  def hyperplaneSignatureMd5(arr: ArrayData, planes: Int): ArrayData = {
    val n = arr.numElements()
    val m = md5PlaneMatrix(planes, n)
    val out = new Array[Any](planes)
    var p = 0
    while (p < planes) {
      val row = m(p)
      var dot = 0.0
      var anyNull = false
      var d = 0
      while (d < n && !anyNull) {
        if (arr.isNullAt(d)) anyNull = true
        else { dot += arr.getFloat(d).toDouble * row(d); d += 1 }
      }
      out(p) = if (!anyNull && dot >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  def hyperplaneSignature(arr: ArrayData, planes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](planes)
    var p = 0
    while (p < planes) {
      val planeSeed = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, 42L)
      var dot = 0.0
      var anyNull = false
      var d = 0
      while (d < n && !anyNull) {
        if (arr.isNullAt(d)) anyNull = true
        else {
          val sign = if ((org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(d, planeSeed) & 1L) == 1L) 1.0 else -1.0
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
}
