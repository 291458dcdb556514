package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens with md5-derived token
  * hashes — one compiled pass per document.
  *
  * Value-identical to the expression chain it replaces (Dedup.simHash64:
  * per-token `conv(substring(md5(tok),…),16,10)` bit-votes folded across
  * 64 `aggregate()` HOFs), which evaluated interpreted: the md5 hex
  * string was parsed back through conv/substring per token, and each of
  * the 64 bit-votes re-folded the token array through a lambda — ~64
  * interpreted passes per doc (measured ~46 s for 50k docs once the
  * bench action stopped letting the optimizer prune the query).
  *
  * Exact semantics preserved (spec-gated in TextKernelsSpec):
  *  - token hash = first 8 bytes of md5(token UTF-8 bytes), big-endian
  *    (== (conv(hex[1..8],16,10) << 32) | conv(hex[9..16],16,10));
  *  - per-bit vote ±1 over ALL tokens (duplicates vote again);
  *  - bit b's vote lands at result bit 63−b (the old fold pushed bit 0
  *    to the top);
  *  - blank/whitespace-only text hashes ONE empty token — splitWs of a
  *    blank string yields [""], and the md5 portability twin in DuckDB
  *    does the same.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    SimHashMd5.simhash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHashMd5.simhash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** First 8 bytes of md5(bytes[from, to)), big-endian. */
  private def md5Head64(bytes: Array[Byte], from: Int, to: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, from, to - from)
    val d = md.digest()
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  def simhash(bytes: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        nTok += 1
        vote(votes, md5Head64(bytes, start, i))
      }
    }
    // splitWs of blank text yields [""]: one empty token votes
    if (nTok == 0) vote(votes, md5Head64(bytes, 0, 0))
    var acc = 0L
    var b = 0
    while (b < 64) {
      acc = (acc << 1) | (if (votes(b) > 0) 1L else 0L)
      b += 1
    }
    acc
  }

  @inline private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
  }
}
