package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(hash, bloomBytes)` — membership probe of a long
  * against a serialized `org.apache.spark.util.sketch.BloomFilter` that
  * rides the plan as a FOLDABLE binary literal (deserialized once per
  * task, [[NnTopK]] pattern). No false negatives, `fpp` false positives —
  * callers must exact-check positive rows (see
  * [[graft.dedup.Dedup.incrementalDedupBloom]]). Codegen'd: the probe
  * stays inside whole-stage codegen, no ScalaUDF row boxing. */
case class BloomContains(value: Expression, bloom: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(value, bloom)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = value.nullable
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint hash")
    else if (bloom.dataType != BinaryType || !bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary bloom-filter argument")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(
    new java.io.ByteArrayInputStream(
      bloom.eval(InternalRow.empty).asInstanceOf[Array[Byte]]))

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else bf.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    val v = value.genCode(ctx)
    ev.copy(code = code"""
      ${v.code}
      boolean ${ev.isNull} = ${v.isNull};
      boolean ${ev.value} = ${ev.isNull} ? false :
        $bfRef.mightContainLong(${v.value});""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomContains =
    copy(value = newChildren(0), bloom = newChildren(1))
}
