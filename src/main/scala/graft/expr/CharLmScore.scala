package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The count tables of a trained [[graft.text.CharLm]] model, packed for
  * the scan-side scoring kernel: trigram/prefix keys are their UTF-16
  * units packed big-endian into a long (3 chars = 48 bits, 2 chars = 32
  * bits — injective, so exact), keys sorted ascending with counts in
  * lockstep for binary search. Alphabet-bounded by construction
  * (≤ A³ + A² entries), so shipping it inside the plan costs KBs-to-MBs
  * regardless of corpus size — the same boundary argument as the join
  * form's broadcast tables. */
final class CharLmModel(val triKeys: Array[Long], val triCnt: Array[Long],
                        val preKeys: Array[Long], val preCnt: Array[Long],
                        val alphabet: Double) extends Serializable {
  require(triKeys.length == triCnt.length && preKeys.length == preCnt.length)

  // open-addressing linear-probe tables (count 0 = empty slot — a real
  // entry always has count >= 1): O(1) per lookup vs O(log T) binary
  // search, rebuilt once per task deserialization (@transient), so only
  // the compact sorted arrays ride the plan
  @transient private lazy val triTable = CharLmModel.build(triKeys, triCnt)
  @transient private lazy val preTable = CharLmModel.build(preKeys, preCnt)

  /** Mean −ln p(c₃|c₁c₂), add-one smoothed, 1e-6-quantized — the exact
    * sum the join form aggregates, evaluated as one sliding pass with no
    * per-position allocation (the packed window rolls: c0←c1←c2). */
  def score(s: String): Double = {
    val (tk, tc, tm) = triTable
    val (pk, pc, pm) = preTable
    val n = s.length - 2
    var c0 = s.charAt(0).toLong
    var c1 = s.charAt(1).toLong
    var sum = 0.0
    var i = 0
    while (i < n) {
      val c2 = s.charAt(i + 2).toLong
      val nt = CharLmModel.lookup(tk, tc, tm, (c0 << 32) | (c1 << 16) | c2)
      val np = CharLmModel.lookup(pk, pc, pm, (c0 << 16) | c1)
      sum -= math.log((nt + 1.0) / (np + alphabet))
      c0 = c1; c1 = c2
      i += 1
    }
    math.round(sum / n * 1e6) / 1e6
  }
}

object CharLmModel {
  /** splitmix64 finalizer — full-avalanche scramble of the packed key. */
  private def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (keys, counts, mask) at ≤ 50% load, power-of-two capacity. */
  private[expr] def build(ks: Array[Long], cs: Array[Long])
      : (Array[Long], Array[Long], Int) = {
    var cap = 16
    while (cap < ks.length * 2) cap <<= 1
    val tk = new Array[Long](cap)
    val tc = new Array[Long](cap)
    val m = cap - 1
    var i = 0
    while (i < ks.length) {
      var idx = (mix(ks(i)) & m).toInt
      while (tc(idx) != 0L) idx = (idx + 1) & m
      tk(idx) = ks(i); tc(idx) = cs(i)
      i += 1
    }
    (tk, tc, m)
  }

  private[expr] def lookup(tk: Array[Long], tc: Array[Long], m: Int,
                           key: Long): Long = {
    var idx = (mix(key) & m).toInt
    while (tc(idx) != 0L) {
      if (tk(idx) == key) return tc(idx)
      idx = (idx + 1) & m
    }
    0L
  }
}

/** `graft_charlm_nll(text, triKeys, triCounts, preKeys, preCounts, A)` —
  * the CCNet-style trigram-LM document score as ONE codegen'd projection
  * kernel: no position explode, no joins, no ScalaUDF row boxing. The
  * four count arrays are FOLDABLE literals (decoded once per task, like
  * [[NnTopK]]'s matrix) and ride the generated code's reference array.
  * NULL for null or sub-trigram-length text — callers filter, matching
  * the join form's "length ≥ 3" frame. */
case class CharLmNll(text: Expression, triKeys: Expression,
                     triCounts: Expression, preKeys: Expression,
                     preCounts: Expression, alphabet: Expression)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(text, triKeys, triCounts, preKeys, preCounts, alphabet)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_charlm_nll"

  override def checkInputDataTypes(): TypeCheckResult = {
    def longArray(e: Expression, what: String): Option[String] = e.dataType match {
      case ArrayType(LongType, _) =>
        if (e.foldable) None else Some(s"$what must be a foldable array<bigint>")
      case other => Some(s"$what must be array<bigint>, got $other")
    }
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string text")
    else (longArray(triKeys, "triKeys") orElse longArray(triCounts, "triCounts")
      orElse longArray(preKeys, "preKeys") orElse longArray(preCounts, "preCounts")
      orElse (if (alphabet.foldable && alphabet.dataType == DoubleType) None
              else Some("alphabet must be a foldable double")))
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  // one decode per (deserialized) expression instance, shared by all rows
  @transient private lazy val model: CharLmModel = {
    def longs(e: Expression): Array[Long] =
      e.eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray()
    new CharLmModel(longs(triKeys), longs(triCounts),
      longs(preKeys), longs(preCounts),
      alphabet.eval(InternalRow.empty).asInstanceOf[Double])
  }

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    val s = t.asInstanceOf[UTF8String].toString
    if (s.length < 3) null else model.score(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("charLmModel", model,
      classOf[CharLmModel].getName)
    val t = text.genCode(ctx)
    val s = ctx.freshName("charLmText")
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${t.isNull}) {
        String $s = ${t.value}.toString();
        if ($s.length() >= 3) {
          ${ev.value} = $modelRef.score($s);
          ${ev.isNull} = false;
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharLmNll =
    copy(text = newChildren(0), triKeys = newChildren(1),
      triCounts = newChildren(2), preKeys = newChildren(3),
      preCounts = newChildren(4), alphabet = newChildren(5))
}
