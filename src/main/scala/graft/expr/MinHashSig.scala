package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native k-permutation MinHash signature over byte-level character-gram
  * shingles of an (already normalized) string column.
  *
  * One pass over the input bytes: each strided shingle window is
  * xxhash64'd once, then re-keyed per permutation with xxh64(p, seed=h')
  * and folded into a running min — no shingle array, no per-permutation
  * array, no lambda dispatch. This replaces the interpreted
  * transform/aggregate formulation (higher-order functions never enter
  * whole-stage codegen and re-evaluate nested expressions per element),
  * which profiled ~3.7 µs per hash eval vs ~nanoseconds compiled.
  *
  * Output: array<long> of length k (never null elements); null input →
  * null. Hash family: XXH64 (Spark's own implementation, seed 42), byte
  * shingles — an internal detail of the signature, not a reference
  * semantic (the reference has no minhash; this is the LLM-pipeline
  * extension operator).
  */
case class MinHashSig(child: Expression, k: Int, gram: Int, stride: Int)
  extends UnaryExpression {

  require(k > 0 && gram > 0 && stride > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSig.signature(bytes, k, gram, stride))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("mhBytes")
      val sig = ctx.freshName("mhSig")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long[] $sig = graft.expr.MinHashSig.signature(
         |  $bytes, $k, $gram, $stride);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Shared kernel for both interpreted eval and generated code. */
  def signature(bytes: Array[Byte], k: Int, gram: Int, stride: Int): Array[Long] = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val len = bytes.length
    val last = math.max(len - gram, 0)
    var i = 0
    while (i <= last) {
      val glen = math.min(gram, len - i)
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, glen, 42L)
      val r1 = XXH64.hashLong(h, 42L)
      var p = 0
      while (p < k) {
        val hp = XXH64.hashLong(p.toLong, r1)
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      i += stride
    }
    sig
  }
}
