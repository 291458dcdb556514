package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR document scorer, packed for the scan kernel: the per-bucket log
  * importance ratios as one plain double array (32 KB at 4096 buckets),
  * plus a per-thread MD5 instance (expression instances are shared
  * across a task's rows and possibly across tasks — the digest must not
  * be). Bucket assignment reproduces the SQL-portable definition
  * bit-for-bit: the first 12 bits of md5(utf8 gram) — i.e. the first 3
  * hex chars parsed base-16 — mod `buckets`. */
final class DsirModel(val ratios: Array[Double]) extends Serializable {
  require(ratios.nonEmpty)

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def bucketOf(gram: String): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((h(0) & 0xFF) << 4) | ((h(1) & 0xF0) >>> 4)) % ratios.length
  }

  /** Bucket ids of the document's grams, unigrams then bigrams — the
    * fit-side twin of [[score]] (same tokens, same order, same md5
    * buckets). */
  def bucketsOf(lowered: String): Array[Int] = {
    val toks = lowered.split("\\s+").filter(_.nonEmpty)
    val n = if (toks.length == 0) 0 else toks.length * 2 - 1
    val out = new Array[Int](math.max(n, 0))
    var i = 0
    while (i < toks.length) {
      out(i) = bucketOf(toks(i))
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      out(toks.length + i) = bucketOf(toks(i) + " " + toks(i + 1))
      i += 1
    }
    out
  }

  /** Σ ratios[bucket(gram)] over nonempty lowercase ws tokens then their
    * space-joined bigrams — the same gram ORDER the array-fold form
    * summed in, so the FP result is bit-identical. */
  def score(lowered: String): Double = {
    val toks = lowered.split("\\s+").filter(_.nonEmpty)
    var sum = 0.0
    var i = 0
    while (i < toks.length) {
      sum += ratios(bucketOf(toks(i)))
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      sum += ratios(bucketOf(toks(i) + " " + toks(i + 1)))
      i += 1
    }
    sum
  }
}

/** `graft_dsir_buckets(text, buckets)` — the document's hashed-gram
  * bucket ids (unigrams then bigrams, same order as the scorer) as one
  * codegen'd pass. Feeds the MODEL FIT: explode(int) + a ≤`buckets`-row
  * groupBy replaces the interpreted wordNgrams/md5/conv chain the fit
  * used to evaluate per gram. NULL text → empty (a null doc has no
  * grams; the fold form's explode dropped it the same way). */
case class DsirBuckets(text: Expression, buckets: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(text, buckets)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsir_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string text")
    else if (!buckets.foldable || buckets.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int bucket count")
    else buckets.eval(InternalRow.empty) match {
      // a non-positive count would NegativeArraySize/require-fail inside
      // an executor — fail analysis with the actual value instead
      case b: Integer if b > 0 => TypeCheckResult.TypeCheckSuccess
      case b => TypeCheckResult.TypeCheckFailure(
        s"$prettyName bucket count must be positive, got $b")
    }

  @transient private lazy val model: DsirModel =
    new DsirModel(new Array[Double](
      buckets.eval(InternalRow.empty).asInstanceOf[Int]))

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      model.bucketsOf(t.asInstanceOf[UTF8String].toLowerCase.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("dsirBucketsModel", model,
      classOf[DsirModel].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${t.isNull}) {
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          $modelRef.bucketsOf(${t.value}.toLowerCase().toString()));
        ${ev.isNull} = false;
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DsirBuckets =
    copy(text = newChildren(0), buckets = newChildren(1))
}

/** `graft_dsir_logw(text, ratios)` — the DSIR log importance weight as
  * ONE codegen'd projection kernel. Replaces the interpreted
  * ArrayAggregate fold (md5 + conv + element_at re-evaluated through the
  * expression interpreter per gram — 9 s/run at sf0.1; the kernel runs
  * the identical math in ~0.3 s). `ratios` must be a foldable
  * array<double> (the driver-fit model, one literal riding the plan);
  * NULL text scores NULL, gram-less text scores 0.0 — both matching the
  * fold form. Lowercasing happens INSIDE the kernel via UTF8String
  * (identical to `lower()`), so callers pass raw text. */
case class DsirLogW(text: Expression, ratios: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(text, ratios)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsir_logw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string text")
    else ratios.dataType match {
      // containsNull=true rejected: toDoubleArray NPEs on a null element
      // at execution — fail analysis instead (the fit never emits nulls)
      case ArrayType(DoubleType, false) if ratios.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<double> (no nulls) of " +
          s"ratios, got $other")
    }

  @transient private lazy val model: DsirModel =
    new DsirModel(ratios.eval(InternalRow.empty)
      .asInstanceOf[ArrayData].toDoubleArray())

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else model.score(t.asInstanceOf[UTF8String].toLowerCase.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("dsirModel", model,
      classOf[DsirModel].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${t.isNull}) {
        ${ev.value} = $modelRef.score(${t.value}.toLowerCase().toString());
        ${ev.isNull} = false;
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DsirLogW =
    copy(text = newChildren(0), ratios = newChildren(1))
}
