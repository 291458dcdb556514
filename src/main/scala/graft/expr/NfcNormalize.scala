package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the first step of
  * every text-cleaning pipeline that ingests real-world crawls, where
  * the same glyph arrives both precomposed (é = U+00E9) and decomposed
  * (e + U+0301): exact dedup, fingerprints, and token counts all
  * disagree across the two encodings until they are canonicalized.
  * Spark has no built-in for this; `java.text.Normalizer` (JDK) matches
  * DuckDB's `nfc_normalize`, giving the registered query an exact
  * cross-engine oracle. Per-row scalar kernel, partition-preserving. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Diacritic stripping (`café` → `cafe`): NFD decomposition + removal
  * of combining marks — the aggressive-ASCII-folding cousin of NFC
  * (search-index and fuzzy-matching pipelines fold accents; exact-dedup
  * pipelines must NOT, which is why the two are separate kernels).
  * Non-decomposable letters (Æ, ø) survive unchanged — the same
  * contract as DuckDB's `strip_accents`, which the registered query's
  * oracle exercises as a true cross-engine check. Same ASCII fast
  * path. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.NfcNormalize.stripAccents($c);")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object NfcNormalize {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (i < str.length && ascii) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(Marks.matcher(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD))
      .replaceAll(""))
  }

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // quick reject: pure ASCII is NFC by construction — skip the
    // normalizer allocation on the overwhelmingly common path
    var ascii = true
    var i = 0
    while (i < str.length && ascii) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
