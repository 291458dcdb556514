package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, UnaryNode, Union}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types._

/** Join-free per-interval MIN/MAX of an ARBITRARY point-side column
  * (r19 — VERDICT r18 Next #1, the decline documented at
  * [[RangeExtrema]]: "largest transfer size among events in each
  * window").
  *
  * [[RangeExtrema]] answers `max(pt)` over `pt ∈ [lo, hi]` as a
  * predecessor query, but `max(f)` over the same membership is NOT a
  * predecessor: the answer is a RANGE-MAXIMUM over the contiguous run
  * of the value-sorted point sequence between the two bounds. The
  * distributed decomposition here:
  *
  *  - points and TWO probes per interval (an L-probe at position lo,
  *    tag 0, and an H-probe at position hi, tag 2 — tags pin the
  *    inclusive boundary to the correct side of equal-valued points
  *    when a range-partition boundary splits them) merge into one
  *    stream, range-exchanged + sorted on (v, tag) by the stock
  *    EnsureRequirements machinery;
  *  - EVERY probe row carries the interval's FULL [lo, hi], so a probe
  *    answers "extrema of f over MY partition's points within
  *    [lo, hi]" exactly, wherever the partitioner routed it: the
  *    partition buffers its points (two double arrays), builds one
  *    min/max segment tree (2n nodes), and answers each local probe in
  *    O(log n) via two binary searches + one tree query;
  *  - partitions FULLY CONTAINED in [lo, hi] (every point qualifies)
  *    are covered by a job-1 per-partition stats table — (hasPoints,
  *    minV, maxV, maxF, minF) per partition, driver state bounded at
  *    numPartitions × 6 values — queried per probe through a tiny
  *    sparse table over the value-ordered non-empty partitions
  *    (contained partitions form one contiguous run because range
  *    partitioning orders partitions by value).
  *
  * COVERAGE is exact: a partition with both qualifying and
  * non-qualifying points spans lo or hi in sort order, so it received
  * the corresponding probe (the probe's sort position falls strictly
  * inside that partition's key range, and a range partitioner never
  * separates a key from keys flanking it); a partition whose points
  * ALL qualify passes the containment test; and DOUBLE-coverage (both
  * probes in one partition, or a contained partition also scanned
  * locally) is harmless because min/max are idempotent. That
  * idempotence is also what makes duplicate interval keys exact for
  * free — the final Aggregate's Max/Min over probe rows is the extreme
  * over the union of the instances' point sets, exactly the
  * join-then-aggregate answer.
  *
  * NaN/±∞/−0.0 (Spark total order: NaN greatest, NaN = NaN,
  * −0.0 = 0.0):
  *  - pt: NaN points are excluded from the stream; they qualify
  *    exactly when hi is NaN, which the operator layer re-attaches
  *    from two tiny aggregates (see
  *    [[graft.ops.RangeAgg.valueExtremaInRangeAgg]]). ±∞ points stay
  *    (ordered normally); −0.0 is normalized to +0.0 by the dbl image.
  *  - bounds: a NaN hi admits every non-NaN point (x ≤ NaN is true
  *    under the total order), so the carried upper bound maps
  *    NaN → +∞; a NaN lo admits no non-NaN point (x ≥ NaN is false),
  *    and NaN as the carried lower bound self-excludes under the
  *    Double.compare searches (no mapping needed). Intervals with
  *    lo > hi under the total order (including lo = NaN with finite
  *    hi) match nothing and are dropped up front; null bounds likewise
  *    (the comparison is null).
  *  - f: NaN f values STAY — SQL's max over a set containing NaN is
  *    NaN and min prefers finite values, which is exactly
  *    Double.compare's order, used for every tree/table combine.
  *    −0.0 f normalizes to +0.0. NULL f rows are excluded up front —
  *    the operator contract (documented there) defines membership as
  *    "qualifying point with non-null f", matching a join form whose
  *    WHERE filters f IS NOT NULL.
  *
  * Memory contract (the one non-streaming piece): job 2 buffers each
  * partition's points (two double arrays, ~16 B/row) plus one segment
  * tree (4n doubles, ~32 B/row) plus its probe rows — O(rows-in-
  * partition), the same per-partition-fits class as a hash aggregate;
  * size spark.sql.shuffle.partitions so partitions fit, exactly as
  * for every other exchange. No pair is ever materialized; cost is
  * O((n + q) log) and independent of band density — the property the
  * pair-enumerating plans (910–1502 s at ×100 on the j7 fixture)
  * lack.
  *
  * Scope (documented): LongType pt/f decline — values above 2^53 lose
  * order-exactness in the double image (callers cast to int/double
  * when the domain allows, as the j7j fixture does). KEYED (equi +
  * band) value extrema also decline here: containment would need
  * per-(partition, key) stats and the probe's run is no longer one
  * contiguous value range per partition table row; the keyed join
  * path remains. */
object RangeValueExtrema {

  private def dbl(e: Expression): Expression =
    Add(Cast(e, DoubleType), Literal(0.0))

  private def orderExact(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Build the plan: per carried key, (min_f, max_f) of `f` over
    * points with `pt ∈ [lo, hi]` (inclusive both ends), NaN points and
    * null-f points excluded (operator layer re-attaches NaN-point
    * groups). Keys with zero qualifying points drop (inner
    * semantics). Output: keyAttrs ++ [min_f: double, max_f: double].
    * None when pt/f/lo/hi are not double-order-exact. */
  def tryBuild(keyAttrs: Seq[Attribute], pt: Expression, f: Expression,
               lo: Expression, hi: Expression,
               ptPlan: LogicalPlan, ivPlan: LogicalPlan)
      : Option[LogicalPlan] = {
    if (!Seq(pt, f, lo, hi).forall(orderExact)) return None
    if (!Seq(pt, f, lo, hi).forall(_.deterministic)) return None

    // intervals: drop bands that match nothing — lo <= hi under
    // Spark's total order (null bounds and lo = NaN with non-NaN hi
    // both fail it; lo = NaN = hi passes but its finite membership is
    // empty by the carried-NaN-lo self-exclusion, leaving only the
    // operator layer's NaN-point branch)
    val keep = LessThanOrEqual(dbl(lo), dbl(hi))
    val ivF = Filter(keep, ivPlan)
    // carried query bounds: hi = NaN means "everything non-NaN" → +∞;
    // lo stays raw (NaN self-excludes under Double.compare)
    val qlo = dbl(lo)
    val qhi = If(IsNaN(dbl(hi)), Literal(Double.PositiveInfinity), dbl(hi))
    def probeChild(pos: Expression, tag: Int): Project =
      Project(Seq(Alias(pos, "_graft_v")(),
        Alias(Literal(tag), "_graft_tag")(),
        Alias(Literal(1), "_graft_probe")()) ++
        keyAttrs ++
        Seq(Alias(qlo, "_graft_qlo")(), Alias(qhi, "_graft_qhi")(),
          Alias(Literal(null, DoubleType), "_graft_f")()), ivF)
    // L at lo with tag 0 (before equal points), H at the MAPPED hi
    // with tag 2 (after equal points) — see coverage note above
    val probesLo = probeChild(dbl(lo), 0)
    val probesHi = probeChild(qhi, 2)

    val ptF = Filter(And(And(IsNotNull(pt), Not(IsNaN(dbl(pt)))),
      IsNotNull(f)), ptPlan)
    val points = Project(Seq(Alias(dbl(pt), "_graft_v")(),
      Alias(Literal(1), "_graft_tag")(),
      Alias(Literal(0), "_graft_probe")()) ++
      keyAttrs.map(ka => Alias(Literal(null, ka.dataType), ka.name)()) ++
      Seq(Alias(Literal(null, DoubleType), "_graft_qlo")(),
        Alias(Literal(null, DoubleType), "_graft_qhi")(),
        Alias(dbl(f), "_graft_f")()), ptF)

    // probes FIRST: Union takes output attributes from its head child,
    // so the carried keys keep their original exprIds
    val union = Union(Seq(probesLo, probesHi, points), byName = false,
      allowMissingCol = false)
    val maxOut = AttributeReference("_graft_maxc", DoubleType,
      nullable = true)()
    val minOut = AttributeReference("_graft_minc", DoubleType,
      nullable = true)()
    val node = RangeValueExtremaNode(keyAttrs.length, maxOut, minOut, union)
    val minAgg = Alias(AggregateExpression(Min(minOut), Complete,
      isDistinct = false), "min_f")()
    val maxAgg = Alias(AggregateExpression(Max(maxOut), Complete,
      isDistinct = false), "max_f")()
    val agg = Aggregate(keyAttrs,
      (keyAttrs: Seq[NamedExpression]) ++ Seq(minAgg, maxAgg), node)
    Some(Filter(IsNotNull(maxAgg.toAttribute), agg))
  }
}

/** Merged-stream range-extrema node. Child layout (positional):
  * [v: double, tag: int, probe: int, key_0..m-1, qlo: double,
  *  qhi: double, f: double]. Output: the m carried keys followed by
  * the per-probe (maxCand, minCand) — extrema of f over THIS probe's
  * visible qualifying points (its own partition's range query plus the
  * fully-contained-partition table), null when it sees none. ONE ROW
  * PER PROBE (two per interval instance); the parent Max/Min
  * aggregate folds the probe rows, idempotence making overlaps and
  * duplicate keys exact. */
case class RangeValueExtremaNode(nKeys: Int, maxOut: AttributeReference,
                                 minOut: AttributeReference,
                                 child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output.slice(3, 3 + nKeys) ++ Seq(maxOut, minOut)
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(maxOut, minOut))
  // positional layout: every child column is required (ColumnPruning
  // must be blocked — see RangeAggPrefixNode)
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : RangeValueExtremaNode = copy(child = newChild)
}

/** Physical range-extrema scan: requires the child range-sorted on
  * (v, tag). Job 1 collects one (nPts, minV, maxV, maxF, minF) row per
  * partition; the driver compacts the non-empty partitions (value-
  * ordered by construction of range partitioning) and builds a sparse
  * table over their f extrema. Job 2 re-reads the same shuffle output:
  * each partition buffers its points (v[], f[]), builds one combined
  * min/max segment tree, and emits one row per probe — the combine of
  * its local range query [lowerBound(qlo), upperBound(qhi)] and the
  * contained-partition run [first minV ≥ qlo, last maxV ≤ qhi] from
  * the driver table. All comparisons are Double.compare (NaN greatest
  * — matching Spark's total order; −0.0 was normalized to +0.0 in the
  * stream image). */
case class RangeValueExtremaExec(nKeys: Int, maxOut: AttributeReference,
                                 minOut: AttributeReference,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    child.output.slice(3, 3 + nKeys) ++ Seq(maxOut, minOut)

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(maxOut, minOut))

  override def nodeName: String = "RangeValueExtrema"

  private def streamOrder: Seq[SortOrder] = Seq(
    SortOrder(child.output(0), Ascending),
    SortOrder(child.output(1), Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(streamOrder) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(streamOrder)

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    UnknownPartitioning(0)

  protected override def doExecute(): RDD[InternalRow] = {
    val m = nKeys
    val fOrd = m + 5   // [v, tag, probe, keys*m, qlo, qhi, f]
    val loOrd = m + 3
    val hiOrd = m + 4
    val childOut = child.output
    require(childOut(0).dataType == DoubleType &&
      childOut(1).dataType == IntegerType &&
      childOut(2).dataType == IntegerType &&
      childOut(loOrd).dataType == DoubleType &&
      childOut(hiOrd).dataType == DoubleType &&
      childOut(fOrd).dataType == DoubleType,
      s"RangeValueExtrema child layout violated: $childOut")
    val keyTypes = childOut.slice(3, 3 + m).map(_.dataType).toArray
    val outTypes = (keyTypes ++ Array[DataType](DoubleType, DoubleType))
      .toArray
    val rdd = child.execute()

    // job 1: per-partition point stats — order-free, so the re-run
    // per-partition sort is wasted work, but the expensive range
    // EXCHANGE is reused across both jobs (same trade as
    // RangeAggPrefix job 1)
    val stats: Array[(Int, Long, Double, Double, Double, Double)] =
      rdd.mapPartitions { it =>
        var n = 0L
        var minV = 0.0; var maxV = 0.0; var maxF = 0.0; var minF = 0.0
        it.foreach { row =>
          if (row.getInt(2) == 0) {
            val v = row.getDouble(0)
            val fv = row.getDouble(fOrd)
            if (n == 0L) { minV = v; maxV = v; maxF = fv; minF = fv }
            else {
              if (java.lang.Double.compare(v, minV) < 0) minV = v
              if (java.lang.Double.compare(v, maxV) > 0) maxV = v
              if (java.lang.Double.compare(fv, maxF) > 0) maxF = fv
              if (java.lang.Double.compare(fv, minF) < 0) minF = fv
            }
            n += 1L
          }
        }
        Iterator.single((TaskContext.getPartitionId(), n, minV, maxV,
          maxF, minF))
      }.collect()

    // compact non-empty partitions in pid order = value order (range
    // partitioning assigns ordered key ranges to ordered pids), so
    // minV and maxV are both nondecreasing across the compact arrays
    // and a probe's fully-contained partitions form one contiguous run
    val nonEmpty = stats.filter(_._2 > 0L).sortBy(_._1)
    val c = nonEmpty.length
    val cMinV = nonEmpty.map(_._3)
    val cMaxV = nonEmpty.map(_._4)
    // sparse tables over the compact partition extrema: O(c log c)
    // driver state, O(1) per probe
    val levels = if (c == 0) 1 else
      (64 - java.lang.Long.numberOfLeadingZeros(c.toLong)).toInt
    val stMax = Array.ofDim[Array[Double]](levels)
    val stMin = Array.ofDim[Array[Double]](levels)
    stMax(0) = nonEmpty.map(_._5)
    stMin(0) = nonEmpty.map(_._6)
    var lvl = 1
    while (lvl < levels) {
      val half = 1 << (lvl - 1)
      val len = c - (1 << lvl) + 1
      stMax(lvl) = new Array[Double](math.max(len, 0))
      stMin(lvl) = new Array[Double](math.max(len, 0))
      var i = 0
      while (i < len) {
        val a = stMax(lvl - 1)(i); val b = stMax(lvl - 1)(i + half)
        stMax(lvl)(i) = if (java.lang.Double.compare(a, b) >= 0) a else b
        val x = stMin(lvl - 1)(i); val y = stMin(lvl - 1)(i + half)
        stMin(lvl)(i) = if (java.lang.Double.compare(x, y) <= 0) x else y
        i += 1
      }
      lvl += 1
    }

    // job 2: buffer points + probes per partition, one segment tree,
    // one emitted row per probe
    rdd.mapPartitions { it =>
      // growable primitive arrays (no boxing)
      var cap = 1 << 10
      var vArr = new Array[Double](cap)
      var fArr = new Array[Double](cap)
      var n = 0
      // probes: copied key values + carried bounds
      val probes = new scala.collection.mutable.ArrayBuffer[
        (Array[Any], Double, Double)]()
      it.foreach { row =>
        if (row.getInt(2) == 0) {
          if (n == cap) {
            cap *= 2
            vArr = java.util.Arrays.copyOf(vArr, cap)
            fArr = java.util.Arrays.copyOf(fArr, cap)
          }
          vArr(n) = row.getDouble(0)
          fArr(n) = row.getDouble(fOrd)
          n += 1
        } else {
          val keys = new Array[Any](m)
          var i = 0
          while (i < m) {
            keys(i) = (if (row.isNullAt(3 + i)) null
              else row.get(3 + i, keyTypes(i))) match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
              case other => other
            }
            i += 1
          }
          probes += ((keys, row.getDouble(loOrd), row.getDouble(hiOrd)))
        }
      }

      // combined min/max segment tree over f in stream (v-sorted) order
      val tMax = new Array[Double](2 * math.max(n, 1))
      val tMin = new Array[Double](2 * math.max(n, 1))
      var i = 0
      while (i < n) { tMax(n + i) = fArr(i); tMin(n + i) = fArr(i); i += 1 }
      i = n - 1
      while (i >= 1) {
        val a = tMax(2 * i); val b = tMax(2 * i + 1)
        tMax(i) = if (java.lang.Double.compare(a, b) >= 0) a else b
        val x = tMin(2 * i); val y = tMin(2 * i + 1)
        tMin(i) = if (java.lang.Double.compare(x, y) <= 0) x else y
        i -= 1
      }
      // first index in [0, n) with v(i) >= x (Double.compare order)
      def lowerBound(x: Double): Int = {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (java.lang.Double.compare(vArr(mid), x) < 0) lo = mid + 1
          else hi = mid
        }
        lo
      }
      // first index in [0, n) with v(i) > x
      def upperBound(x: Double): Int = {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (java.lang.Double.compare(vArr(mid), x) <= 0) lo = mid + 1
          else hi = mid
        }
        lo
      }
      // first compact-partition index with cMinV(i) >= x / > x
      def cLower(arr: Array[Double], x: Double, strictOver: Boolean): Int = {
        var lo = 0; var hi = c
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val cmp = java.lang.Double.compare(arr(mid), x)
          if (if (strictOver) cmp <= 0 else cmp < 0) lo = mid + 1
          else hi = mid
        }
        lo
      }

      val proj = UnsafeProjection.create(outTypes)
      val out = new GenericInternalRow(m + 2)
      probes.iterator.map { case (keys, qlo, qhi) =>
        var has = false
        var mx = 0.0
        var mn = 0.0
        def take(a: Double, b: Double): Unit = {
          if (!has) { mx = a; mn = b; has = true }
          else {
            if (java.lang.Double.compare(a, mx) > 0) mx = a
            if (java.lang.Double.compare(b, mn) < 0) mn = b
          }
        }
        // local range query over this partition's points
        val s = lowerBound(qlo)
        val e = upperBound(qhi) // exclusive
        if (s < e) {
          var l = s + n; var r = e + n
          while (l < r) {
            if ((l & 1) == 1) { take(tMax(l), tMin(l)); l += 1 }
            if ((r & 1) == 1) { r -= 1; take(tMax(r), tMin(r)) }
            l >>= 1; r >>= 1
          }
        }
        // fully-contained partitions from the driver table
        val cs = cLower(cMinV, qlo, strictOver = false)
        val ce = cLower(cMaxV, qhi, strictOver = true) - 1 // inclusive
        if (cs <= ce) {
          val k = 63 - java.lang.Long.numberOfLeadingZeros(
            (ce - cs + 1).toLong)
          val ki = k.toInt
          take(stMax(ki)(cs), stMin(ki)(cs))
          take(stMax(ki)(ce - (1 << ki) + 1), stMin(ki)(ce - (1 << ki) + 1))
        }
        var j = 0
        while (j < m) { out.update(j, keys(j)); j += 1 }
        out.update(m, if (has) mx else null)
        out.update(m + 1, if (has) mn else null)
        proj(out): InternalRow
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : RangeValueExtremaExec = copy(child = newChild)
}
