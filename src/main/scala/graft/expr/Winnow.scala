package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03,
  * the MOSS algorithm): hash every k-char gram, slide a window of w
  * consecutive hashes, select each window's minimum, return the DISTINCT
  * selected hashes sorted ascending. Any two documents sharing a common
  * substring of length ≥ k + w − 1 are guaranteed to share at least one
  * fingerprint — the local, position-robust dedup/overlap primitive the
  * whole-doc md5 fingerprint (TextStats.fingerprintMd5) cannot provide.
  *
  * The gram hash is the first 15 hex digits of md5(gram) parsed as a
  * long — md5 being the one hash both this engine and the DuckDB oracle
  * share (same portability argument as Curation.md5Bucket), so the
  * registered query carries an EXACT SQL twin (window MIN over
  * per-position md5 substrings). The selected-hash SET is invariant to
  * the tie-break rule (tied minima share the value), which keeps the
  * cross-engine contract clean. A production swap to an O(1)-per-slide
  * Karp–Rabin rolling hash changes only this function — the winnowing
  * structure is hash-agnostic. Per-row cost O(len · k) md5 work; scalar
  * kernel, embarrassingly parallel, partition-preserving.
  *
  * Character positions are UTF-16 units (fixture text is ASCII; the
  * oracle twin counts codepoints — identical on ASCII).
  */
case class GraftWinnow(child: Expression, k: Int, w: Int,
                       kr: Boolean = false)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (kr) "graft_winnow_kr" else "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    if (kr) Winnow.fingerprintsKr(input.asInstanceOf[UTF8String].toString, k, w)
    else Winnow.fingerprints(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (kr)
        s"${ev.value} = graft.expr.Winnow.fingerprintsKr($c.toString(), $k, $w);"
      else
        s"${ev.value} = graft.expr.Winnow.fingerprints($c.toString(), $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): GraftWinnow =
    copy(child = newChild)
}

object Winnow {

  /** First 15 hex digits of md5(gram utf-8 bytes) as a long (60 bits —
    * fits a signed long; matches the DuckDB per-digit parse). */
  private def gramHash(md: java.security.MessageDigest,
                       s: String, from: Int, k: Int): Long = {
    md.reset()
    val d = md.digest(
      s.substring(from, from + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = 7.5 bytes: 7 full bytes + the high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h << 4) | ((d(7) & 0xF0L) >> 4)
  }

  def fingerprints(text: String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1)
    val nGrams = text.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hashes(i) = gramHash(md, text, i, k); i += 1 }
    select(hashes, w)
  }

  /** The PRODUCTION-scale hash variant the md5 form's scaladoc promises:
    * Karp–Rabin polynomial rolling hash (base 1000003, 64-bit
    * wraparound) — O(1) per slide instead of O(k) digest work, same
    * winnowing structure and guarantee. The rolling recurrence has a
    * closed per-position form (an 8-term polynomial sum with B-powers
    * pre-reduced mod 2^64), so the registered queries carry an EXACT
    * DuckDB twin (SparkEntry.winnowKrSql) on top of the shared-substring
    * guarantee + brute-force specs. */
  def fingerprintsKr(text: String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1)
    val nGrams = text.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - text.charAt(i - 1) * bk) * B + text.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    select(hashes, w)
  }

  /** Shared winnowing selection: distinct sliding-window minima. */
  private def select(hashes: Array[Long], w: Int): ArrayData = {
    val nGrams = hashes.length
    val selected = new java.util.TreeSet[java.lang.Long]()
    // sliding-window minimum via monotonic deque of indices
    val deque = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i))
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) selected.add(hashes(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
