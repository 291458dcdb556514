package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane sign bits of an embedding, packed into a long
  * (bit b = 1 iff the projection of the vector onto pseudo-random plane b
  * is positive). Plane components are derived from XXH64(seed, b·4096+i)
  * — deterministic, no plane matrix to broadcast; two vectors with cosine
  * near 1 agree on most bits.
  *
  * Native replacement for the interpreted zip_with/aggregate formulation
  * (one compiled loop over dims·bits instead of per-element lambda
  * dispatch). `bits` ≤ 64.
  */
case class RhpBits(child: Expression, bits: Int, seed: Int)
  extends UnaryExpression {

  require(bits > 0 && bits <= 64, "bits must be in [1, 64]")

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rhp_bits requires array<float|double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rhp_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (elemIsFloat) RhpBits.packFloat(arr.toFloatArray(), bits, seed)
    else RhpBits.packDouble(arr.toDoubleArray(), bits, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = if (elemIsFloat) "packFloat" else "packDouble"
      val conv = if (elemIsFloat) "toFloatArray" else "toDoubleArray"
      s"${ev.value} = graft.expr.RhpBits.$kernel($c.$conv(), $bits, $seed);"
    })

  override protected def withNewChildInternal(newChild: Expression): RhpBits =
    copy(child = newChild)
}

object RhpBits {
  /** Pseudo-random plane component in [-1000, 1000]. */
  @inline private def comp(b: Int, i: Int, seed: Int): Double =
    (Math.floorMod(XXH64.hashLong(b.toLong * 4096 + i, seed), 2001L) - 1000L)
      .toDouble

  def packFloat(v: Array[Float], bits: Int, seed: Int): Long = {
    var code = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += v(i) * comp(b, i, seed); i += 1 }
      if (proj > 0) code |= (1L << b)
      b += 1
    }
    code
  }

  def packDouble(v: Array[Double], bits: Int, seed: Int): Long = {
    var code = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += v(i) * comp(b, i, seed); i += 1 }
      if (proj > 0) code |= (1L << b)
      b += 1
    }
    code
  }
}
