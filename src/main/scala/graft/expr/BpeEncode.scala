package graft.expr

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A trained BPE merge table packed for the scan-side encode kernel.
  *
  * Contract (shared verbatim with the DuckDB twin,
  * [[graft.text.Bpe.encodeRecursiveCte]]): a word is the space-wrapped,
  * space-joined sequence of its codepoints (`"ab"` → `" a b "`); each
  * merge `(x, y)`, in learned order, rewrites `" x y "` → `" xy "` via
  * repeated left-to-right non-overlapping replace passes until fixpoint
  * before the next merge runs. Per-merge fixpoint in learned order is
  * exactly greedy lowest-rank BPE (a later merge can never re-enable an
  * earlier pair: new symbols are born after the earlier pair's parts).
  * The one documented divergence from canonical leftmost-pair merging is
  * WITHIN a single merge on runs of >= 5 of one symbol: the first
  * replace pass consumes the shared delimiter and alternates
  * (`aaaaa` → `aa a aa`; leftmost-greedy gives `aa aa a`), and the
  * isolated singles are a fixpoint. Pinned in BpeSpec, byte-identical on
  * both engines because both sides use the same replace semantics.
  *
  * Symbols never contain whitespace (words are whitespace-split), so the
  * space-delimited rewrite is unambiguous. The merge table is a foldable
  * `array<string>` literal of `"x y"` entries — KBs riding the plan, the
  * same plan-shipped-model shape as [[CharLmModel]].
  */
final class BpeModel(val merges: Array[String]) extends Serializable {
  // " x y " -> " xy " rewrite pairs, in learned order
  @transient private lazy val pats: Array[String] = merges.map { m =>
    val i = m.indexOf(' ')
    require(i > 0 && m.indexOf(' ', i + 1) < 0, s"merge must be 'x y': '$m'")
    " " + m.substring(0, i) + " " + m.substring(i + 1) + " "
  }
  @transient private lazy val reps: Array[String] =
    merges.map(m => " " + m.replace(" ", "") + " ")

  // word -> encoded pieces. Words repeat heavily across documents, so the
  // count kernel is amortized O(1) per occurrence; bounded so adversarial
  // vocabularies can't grow it past ~CacheCap entries, ConcurrentHashMap
  // because local-mode tasks may share one deserialized plan object.
  @transient private lazy val cache = new ConcurrentHashMap[String, String]()

  /** Space-joined BPE pieces of one word ("" for the empty word). */
  def encode(word: String): String = {
    if (word.isEmpty) return ""
    val hit = cache.get(word)
    if (hit != null) return hit
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    val ps = pats
    val rs = reps
    var m = 0
    while (m < ps.length) {
      while (s.contains(ps(m))) s = s.replace(ps(m), rs(m))
      m += 1
    }
    val out = s.substring(1, s.length - 1)
    if (cache.size < BpeModel.CacheCap) cache.put(word, out)
    out
  }

  /** Number of BPE pieces of one word (0 for the empty word). */
  def pieceCount(word: String): Int = {
    if (word.isEmpty) return 0
    val e = encode(word)
    var n = 1
    var i = 0
    while (i < e.length) {
      if (e.charAt(i) == ' ') n += 1
      i += 1
    }
    n
  }

  /** Total BPE pieces over the whitespace-split tokens of `text` — the
    * one-pass scan form of (explode words → join vocab counts → sum):
    * same whitespace set as [[TextKernels.wsTokenCount]] (Java regex
    * `\s`), so `n_words`/`n_bpe_tokens` columns stay frame-consistent. */
  def countTokens(text: String): Long = {
    var total = 0L
    var start = -1
    var i = 0
    while (i <= text.length) {
      val ws = i == text.length || BpeModel.isWs(text.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        total += pieceCount(text.substring(start, i))
        start = -1
      }
      i += 1
    }
    total
  }
}

object BpeModel {
  private[expr] val CacheCap = 1 << 16

  @inline private[expr] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private[expr] def decode(merges: Expression): BpeModel =
    new BpeModel(merges.eval(InternalRow.empty).asInstanceOf[ArrayData]
      .toObjectArray(StringType)
      .map { v =>
        require(v != null, "bpe merge table must not contain nulls")
        v.asInstanceOf[UTF8String].toString
      })

  private[expr] def check(prettyName: String, text: Expression,
                          merges: Expression): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string text")
    else merges.dataType match {
      // containsNull=true is tolerated at the type level (typedlit infers
      // it for Seq[String]); decode rejects an actual null element
      case ArrayType(StringType, _) if merges.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName merges must be a foldable array<string>, got $other")
    }
  }
}

/** `graft_bpe_encode(word, merges)` — space-joined BPE pieces of one
  * word under a foldable merge table. NULL in, NULL out. */
case class BpeEncode(text: Expression, merges: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(text, merges)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    BpeModel.check(prettyName, text, merges)

  @transient private lazy val model: BpeModel = BpeModel.decode(merges)

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else UTF8String.fromString(model.encode(t.asInstanceOf[UTF8String].toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = UTF8String.fromString($modelRef.encode(${t.value}.toString()));
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeEncode =
    copy(text = newChildren(0), merges = newChildren(1))
}

/** `graft_bpe_count(text, merges)` — total BPE pieces over the
  * whitespace-split tokens of a document, as ONE codegen'd projection
  * kernel: no word explode, no vocab join, no shuffle. NULL in, NULL
  * out; blank text counts 0. */
case class BpeCount(text: Expression, merges: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(text, merges)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  override def checkInputDataTypes(): TypeCheckResult =
    BpeModel.check(prettyName, text, merges)

  @transient private lazy val model: BpeModel = BpeModel.decode(merges)

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else model.countTokens(t.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = $modelRef.countTokens(${t.value}.toString());
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeCount =
    copy(text = newChildren(0), merges = newChildren(1))
}
