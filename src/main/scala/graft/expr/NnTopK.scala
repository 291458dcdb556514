package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_nn_topk(vec, mat, k)` — the k nearest rows of a FOLDABLE matrix
  * literal to the row's vector, as `array<struct<idx:int, dist:double>>`
  * sorted ascending by (dist, idx). Euclidean metric, identical summation
  * order to [[GraftL2Dist]] (bit-compat with the join+window formulation
  * it replaces).
  *
  * Why an expression and not a join: brute-force kNN against a
  * driver-sized reference set (a curve sample, DBSCAN core points, IVF
  * probes) as a BroadcastNestedLoopJoin MATERIALIZES n·m joined rows just
  * to rank and discard them — the row-copy dominates the distance
  * arithmetic. Here the m reference vectors ride the plan as one Literal,
  * each input row does one compiled heap-select pass (O(m·d + m·log k),
  * zero intermediate rows), and the scan stays embarrassingly parallel —
  * the shape that survives 100 TB is "per-row kernel against broadcast
  * state", not "n·m rows through an operator". CodegenFallback is
  * deliberate: per-call work is a compiled O(m·d) loop, so the virtual
  * eval dispatch is noise.
  *
  * Ties on distance resolve to the smaller idx, so callers encode their
  * tie-break key in matrix ORDER (e.g. rows sorted by id). */
case class NnTopK(vec: Expression, mat: Expression, k: Int)
  extends Expression with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(vec, mat)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_nn_topk"

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = mat.dataType match {
      case ArrayType(ArrayType(FloatType, _) | ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk || !matOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<float|double>>), " +
        s"got (${vec.dataType}, ${mat.dataType})")
    else if (!mat.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires the matrix argument to be foldable (a literal)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("idx", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)

  // one decode per (deserialized) expression instance, shared by every row
  // the task evaluates
  @transient private lazy val matrix: Array[Array[Double]] = {
    val rowsAreFloat = mat.dataType match {
      case ArrayType(et, _) => isFloatArray(et)
      case _ => false
    }
    val ad = mat.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      VecKernels.asDoubles(ad.getArray(i), rowsAreFloat)
    }
  }

  override def eval(input: InternalRow): Any = {
    val v0 = vec.eval(input)
    if (v0 == null) return null
    val v = VecKernels.asDoubles(v0.asInstanceOf[ArrayData],
      isFloatArray(vec.dataType))
    val m = matrix.length
    val kk = math.min(k, m)
    if (kk == 0) return new GenericArrayData(Array.empty[Any])
    // bounded max-heap on (dist, idx): root = current worst of the best k
    val hd = new Array[Double](kk)
    val hi = new Array[Int](kk)
    var size = 0
    def worse(d1: Double, i1: Int, d2: Double, i2: Int): Boolean =
      d1 > d2 || (d1 == d2 && i1 > i2)
    var r = 0
    while (r < m) {
      val d = VecKernels.l2Dist(v, matrix(r))
      if (size < kk) {
        var c = size; hd(c) = d; hi(c) = r; size += 1
        while (c > 0 && worse(hd(c), hi(c), hd((c - 1) / 2), hi((c - 1) / 2))) {
          val p = (c - 1) / 2
          val td = hd(c); hd(c) = hd(p); hd(p) = td
          val ti = hi(c); hi(c) = hi(p); hi(p) = ti
          c = p
        }
      } else if (worse(hd(0), hi(0), d, r)) {
        hd(0) = d; hi(0) = r
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val rr = 2 * c + 2
          var w = c
          if (l < kk && worse(hd(l), hi(l), hd(w), hi(w))) w = l
          if (rr < kk && worse(hd(rr), hi(rr), hd(w), hi(w))) w = rr
          if (w == c) done = true
          else {
            val td = hd(c); hd(c) = hd(w); hd(w) = td
            val ti = hi(c); hi(c) = hi(w); hi(w) = ti
            c = w
          }
        }
      }
      r += 1
    }
    // heap -> ascending (dist, idx)
    val order = (0 until size).sortBy(i => (hd(i), hi(i)))
    new GenericArrayData(order.map { i =>
      new GenericInternalRow(Array[Any](hi(i), hd(i)))
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NnTopK =
    copy(vec = newChildren(0), mat = newChildren(1))
}
