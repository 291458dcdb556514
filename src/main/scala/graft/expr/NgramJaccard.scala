package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native char-n-gram Jaccard similarity of two (already normalized)
  * strings: |A ∩ B| / |A ∪ B| over DISTINCT xxhash64 shingle hashes.
  *
  * Exactly the value of the expression chain it replaces —
  * `jaccardOfSets(shingleSet(a), shingleSet(b))` with
  * `shingleSet = array_distinct(transform(sequence(1, greatest(len-g+1,1)),
  * i => xxhash64(substr(i, g))))` — but in one compiled pass: the
  * interpreted transform/array_distinct/array_intersect chain
  * re-dispatches per element and materializes three arrays per side
  * (measured: the adjacent-pair query was ~5 s for 5k docs once the
  * bench action stopped letting the optimizer prune it). Hash identity:
  * Spark's xxhash64 (XXH64, seed 42) over the UTF-8 bytes of each
  * char-positioned window, so values are bit-identical to the old form
  * (spec-gated in TextKernelsSpec).
  *
  * Window semantics mirror substr: windows start at every char position
  * 1..max(len-g+1, 1); a string shorter than g yields its single
  * truncated window (the empty string hashes as one empty shingle, so
  * two empty strings are jaccard 1.0, matching the old union==0 guard).
  */
case class NgramJaccard(left: Expression, right: Expression, gram: Int)
  extends BinaryExpression {

  require(gram > 0, "gram must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_jaccard requires string inputs, got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ngram_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.jaccard(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.NgramJaccard.jaccard($a, $b, $gram);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

object NgramJaccard {

  /** Sorted array of DISTINCT xxhash64 gram hashes of `s`. */
  def gramHashes(s: UTF8String, gram: Int): Array[Long] = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    // byte offset of each char start, plus the end sentinel
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(nChars) = bytes.length
    val n = math.max(nChars - (gram - 1), 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val start = if (i < nChars) offs(i) else bytes.length
      val end = offs(math.min(i + gram, nChars))
      hs(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }

  def jaccard(a: UTF8String, b: UTF8String, gram: Int): Double = {
    val ha = gramHashes(a, gram)
    val hb = gramHashes(b, gram)
    var i = 0
    var j = 0
    var inter = 0
    while (i < ha.length && j < hb.length) {
      val c = java.lang.Long.compare(ha(i), hb(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = ha.length + hb.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
