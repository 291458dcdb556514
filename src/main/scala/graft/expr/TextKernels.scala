package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-statistic kernels.
  *
  * The curation battery's per-doc signals (token counts, stopword hits,
  * punctuation density, alpha-token fraction) were previously built from
  * `split` + higher-order `filter(toks, …)` / `regexp_count` chains.
  * Those are semantically right but evaluate interpreted: HOFs never
  * enter whole-stage codegen and re-dispatch the lambda per element, and
  * each signal re-materializes the token array. Measured honestly (noop
  * sink, 500k docs) the quality+langId predicate cost ~16 s — far from
  * the "scan speed" the 100-TB story requires.
  *
  * Each kernel here is one compiled pass over the UTF8 bytes with no
  * array materialization and no regex. Byte-level is exact: the
  * whitespace class of Java's `\s` ([ \t\n\x0B\f\r]) is pure ASCII, and
  * multi-byte UTF-8 sequences always have the high bit set, so they can
  * never be mistaken for whitespace.
  *
  * Semantics are bit-identical to the expression forms they replace
  * (`splitWs` = maximal non-whitespace runs; token equality is exact
  * byte equality), so the DuckDB oracle twins — which still use the
  * list-based SQL — stay green. Spec-gated against the old forms in
  * TextKernelsSpec.
  */
object TextKernels {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** deflate(bytes).length / bytes.length (level 6, raw). 1.0 for empty
    * input. A fresh Deflater per call: no shared state across rows or
    * threads; `end()` releases the native buffer eagerly. */
  def deflateRatio(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    } finally d.end()
  }

  /** Count of maximal non-whitespace runs (== size(splitWs(text)) for
    * non-blank text, 0 for blank — the tokenCountWs contract). */
  def wsTokenCount(bytes: Array[Byte]): Int = {
    var n = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** Count of non-whitespace BYTES — equals the total CHARACTER length
    * of the splitWs tokens for ASCII text; for multi-byte text both
    * sides of the parity are derived from the same UTF8String length
    * semantics (see TextKernelsSpec). */
  def nonWsCharCount(s: UTF8String): Int = {
    // character count = total chars minus whitespace chars; whitespace
    // is ASCII so one byte == one char for every ws occurrence
    val bytes = s.getBytes
    var ws = 0
    var i = 0
    while (i < bytes.length) {
      if (isWs(bytes(i))) ws += 1
      i += 1
    }
    s.numChars() - ws
  }

  /** Count of characters matching [^A-Za-z0-9\s] — the punctuation
    * density numerator. Multi-byte chars match (they are neither
    * alphanumeric nor whitespace), counted once per CHARACTER: only
    * lead bytes (not 0b10xxxxxx continuations) are counted. */
  def nonAlnumCount(bytes: Array[Byte]): Int = {
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val cont = (b & 0xc0) == 0x80
      if (!cont) {
        val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        if (!alnum && !isWs(b)) n += 1
      }
      i += 1
    }
    n
  }

  /** Count of whitespace tokens byte-equal to any of `stops`. */
  def stopHits(bytes: Array[Byte], stops: Array[Array[Byte]]): Int = {
    var n = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        val tlen = i - start
        var s = 0
        var hit = false
        while (!hit && s < stops.length) {
          val st = stops(s)
          hit = st.length == tlen &&
            java.util.Arrays.equals(bytes, start, i, st, 0, tlen)
          s += 1
        }
        if (hit) n += 1
      }
    }
    n
  }

  /** BPE-ish subword count: the regex [A-Za-z]+|[0-9]|[^A-Za-z0-9\s]
    * evaluated as one byte pass — letter RUNS count once, digits and
    * other non-whitespace characters once EACH. Multi-byte codepoints
    * count once (lead byte advances past continuations), matching the
    * DuckDB/RE2 oracle's per-codepoint semantics; Java's regexp_count
    * counted supplementary (4-byte) codepoints twice (one per UTF-16
    * unit) — a latent engine-vs-oracle divergence this kernel closes. */
  def bpeishCount(bytes: Array[Byte]): Int = {
    var n = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        n += 1
        while (i < len && ((bytes(i) >= 'A' && bytes(i) <= 'Z') ||
          (bytes(i) >= 'a' && bytes(i) <= 'z'))) i += 1
      } else if (isWs(b)) {
        i += 1
      } else if (b >= '0' && b <= '9') {
        n += 1; i += 1
      } else {
        n += 1
        // skip one UTF-8 codepoint: 1 byte for ASCII, else lead-byte length
        val step =
          if ((b & 0x80) == 0) 1
          else if ((b & 0xe0) == 0xc0) 2
          else if ((b & 0xf0) == 0xe0) 3
          else if ((b & 0xf8) == 0xf0) 4
          else 1 // stray continuation byte: defensive single step
        i += step
      }
    }
    n
  }

  /** Count of whitespace tokens containing at least one ASCII letter
    * (== size(filter(toks, _.rlike("[A-Za-z]")))). */
  def letterTokenCount(bytes: Array[Byte]): Int = {
    var n = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      var letter = false
      while (i < len && !isWs(bytes(i))) {
        val b = bytes(i)
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) letter = true
        i += 1
      }
      if (i > start && letter) n += 1
    }
    n
  }
}

/** Base for the string→int kernels: null-safe, codegen via a static
  * kernel call (same body for interpreted eval and generated code). */
abstract class TextKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType = IntegerType
}

/** `graft_deflate_ratio(text)` — deflated-size / raw-size of the UTF-8
  * bytes (level 6, raw deflate): the compression-ratio quality signal of
  * published pretraining filters — boilerplate/template text compresses
  * far below prose, machine noise compresses worse. DOUBLE in (0, ~1.1];
  * empty text → 1.0. No SQL twin exists (no zlib in the oracle engine) —
  * the registered query is rows-only, semantics spec-gated on
  * repetitive ≪ prose < random orderings. Per-row cost is the deflate
  * of one document's bytes; kernel state is per-call (thread-safe). */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_deflate_ratio"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.deflateRatio($c.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

case class WsTokenCount(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "graft_ws_token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wsTokenCount(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.wsTokenCount($c.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

case class NonWsCharCount(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "graft_nonws_char_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nonWsCharCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.nonWsCharCount($c);")
  override protected def withNewChildInternal(newChild: Expression): NonWsCharCount =
    copy(child = newChild)
}

case class NonAlnumCount(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "graft_non_alnum_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nonAlnumCount(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.nonAlnumCount($c.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): NonAlnumCount =
    copy(child = newChild)
}

case class BpeishCount(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "graft_bpeish_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeishCount(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.bpeishCount($c.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): BpeishCount =
    copy(child = newChild)
}

case class LetterTokenCount(child: Expression) extends TextKernelExpr {
  override def prettyName: String = "graft_letter_token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.letterTokenCount(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.letterTokenCount($c.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): LetterTokenCount =
    copy(child = newChild)
}

/** Stopword-hit count with the stop list baked in at plan time (it is
  * always a small compile-time constant list). */
case class StopHits(child: Expression, stops: Seq[String]) extends TextKernelExpr {
  require(stops.nonEmpty, "graft_stop_hits needs a non-empty stop list")
  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stops.map(UTF8String.fromString(_).getBytes).toArray
  override def prettyName: String = "graft_stop_hits"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.stopHits(input.asInstanceOf[UTF8String].getBytes, stopBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("graftStops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextKernels.stopHits($c.getBytes(), $stopsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): StopHits =
    copy(child = newChild)
}
