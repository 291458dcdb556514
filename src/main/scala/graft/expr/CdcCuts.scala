package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking cut points (the gear-hash CDC family: LBFS /
  * FastCDC — Xia et al., USENIX ATC'16): a rolling hash
  * `h' = 2·h + gear[c]` slides over the text and a chunk boundary falls
  * wherever the low `maskBits` bits of h are zero (expected chunk length
  * 2^maskBits), bounded by [minLen, maxLen]. h is NOT reset at cuts:
  * since each shift pushes a bit out, h mod 2^k depends only on the
  * trailing k characters — the SELF-SYNCHRONIZING property that makes
  * chunking content-local (a reset would make every boundary depend on
  * the previous cut, and shared regions across documents would take
  * several chunks to re-align; only the minLen/maxLen clamps retain a
  * small position dependence, the standard FastCDC trade). An edit
  * therefore perturbs at most the chunks it touches — downstream
  * dedup (group by chunk hash) then deduplicates shared regions across
  * documents that whole-document or shingle fingerprints can't align.
  * This is the fourth fingerprinting primitive next to MinHash, SimHash
  * and winnowing, and the one real storage/training-data dedup systems
  * use for byte-range dedup.
  *
  * ORACLE-EXACT by construction: the boundary test reads only the low
  * `maskBits` bits, and the recurrence `h' = (2h + g) mod 2^k` is CLOSED
  * over those bits — so the DuckDB twin replays it with tiny integers
  * (no 64-bit wraparound needed, the winnowKr HUGEINT contortion
  * avoided). The gear table is md5-derived ("gear_<byte>", first 15 hex
  * digits as a long — the shared-hash idiom of GraftWinnow), so both
  * engines derive identical tables from scratch. Returns the 1-based
  * INCLUSIVE end offset of every chunk (the final partial chunk
  * included); empty text → empty array. Positions are UTF-16 units and
  * the byte is `char & 0xFF`. Cross-engine contract (pinned by
  * CdcSpec "cross-engine contract"): the DuckDB twin's
  * character-indexed codepoint-mod-256 walk agrees with this kernel on
  * ALL BMP text — a BMP codepoint is one UTF-16 unit and
  * `unit & 0xFF == codepoint % 256` — and diverges only on astral
  * codepoints (surrogate pairs: two hash steps and unit-counted
  * positions here vs one character there). Fixture text is ASCII, well
  * inside the contract.
  *
  * Scale shape: pure per-row scalar kernel inside whole-stage codegen,
  * partition-preserving, no shuffle; the chunk-dedup GROUP BY downstream
  * is the only exchange, carrying md5 hashes, not text.
  */
case class GraftCdcCuts(child: Expression, minLen: Int, maxLen: Int,
                        maskBits: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    Cdc.cuts(input.asInstanceOf[UTF8String].toString, minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Cdc.cuts($c.toString(), " +
        s"$minLen, $maxLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): GraftCdcCuts =
    copy(child = newChild)
}

object Cdc {

  /** md5-derived gear table, identical in both engines: first 15 hex
    * digits of md5("gear_<byte>") parsed as a long (GraftWinnow's
    * shared-hash idiom). Only the low maskBits are ever read. */
  val gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { b =>
      md.reset()
      val d = md.digest(
        s"gear_$b".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      (h << 4) | ((d(7) & 0xF0L) >> 4)
    }.toArray
  }

  def cuts(text: String, minLen: Int, maxLen: Int, maskBits: Int): ArrayData = {
    require(minLen >= 1 && maxLen >= minLen && maskBits >= 1 && maskBits <= 30,
      s"need 1 <= minLen <= maxLen and maskBits in [1,30], " +
        s"got ($minLen, $maxLen, $maskBits)")
    val mask = (1 << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0
    var start = 0 // 0-based chunk start
    var i = 0
    while (i < text.length) {
      val b = text.charAt(i) & 0xFF
      h = ((h << 1) + (gear(b) & mask).toInt) & mask
      val len = i - start + 1
      if ((len >= minLen && h == 0) || len >= maxLen) {
        out += i + 1 // 1-based inclusive end
        start = i + 1
      }
      i += 1
    }
    if (start < text.length) out += text.length
    new GenericArrayData(out.toArray)
  }
}
