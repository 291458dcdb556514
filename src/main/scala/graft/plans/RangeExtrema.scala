package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, UnaryNode, Union}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types._

/** Join-free per-interval MIN/MAX of the point value (r18 — VERDICT r17
  * Next #3's "ship it" arm).
  *
  * RangeAggPrefix correctly DECLINES extrema: a per-interval max is not
  * a difference of two prefix values. But when the aggregated value IS
  * the point expression itself — `max(pt)` / `min(pt)` over
  * `pt ∈ [lo, hi]`, the j7 family's own shape — the answer over the
  * value-ordered stream degenerates to a PREDECESSOR query:
  *
  *   max{pt : lo ≤ pt ≤ hi} = (last point value ≤ hi), valid iff ≥ lo
  *
  * So one scan of the same merged stream RangeAggPrefix sorts — points
  * and hi-probes ordered by (v, tag), tag placing an inclusive probe
  * AFTER equal-valued points and a strict one BEFORE — maintains a
  * running "last point value seen" and emits it at every probe, with
  * the probe's OWN lo carried on the row so validity (pred ≥ lo, or
  * > for a strict lo) is a row-local filter. min falls out by
  * NEGATION: min{pt ∈ [lo, hi]} = −max{−pt ∈ [−hi, −lo]} — the same
  * plan over the negated stream.
  *
  * Duplicate interval keys are exact FOR FREE: max is union-compatible
  * (the SQL group max over duplicate-key instances is the max over the
  * union of their point sets = the max over all instances' valid
  * predecessor rows), so the final Aggregate's plain Max over probe
  * rows — nulls (invalid/empty) ignored — is the join form's answer.
  * A group with no valid row aggregates to null and the inner-join
  * Filter drops it.
  *
  * Distribution: the stock range exchange + sort (OrderedDistribution
  * on (v, tag), same as RangeAggPrefix); job 1 collects one (hasPoint,
  * lastV) pair per partition, the driver folds them into per-partition
  * seed values (running last across preceding partitions), job 2
  * re-reads the same shuffle output and emits one row per probe.
  * Driver state: numPartitions × (bool, double) — the bounded-state
  * contract. No pair is ever materialized; cost is O((n+q) log),
  * independent of band density — the property the pair-enumerating
  * plans (910–1502 s at ×100 on the j7 fixture) lack.
  *
  * NaN: points stay (same argument as RangeAggPrefix r18) — NaN points
  * sort last, an inclusive hi = NaN probe sorts after them and reads
  * pred = NaN, validity NaN ≥ lo is true under Spark's total order,
  * and SQL's max over a set containing NaN is NaN: all consistent with
  * the join form. −0.0 is normalized to +0.0 by the same dbl() image.
  *
  * Scope (documented, not omission): extrema of an ARBITRARY pt-side
  * column (`max(amount)` over events in range) are NOT a predecessor
  * query — they need per-bin sparse tables over the value-sorted f
  * sequence (O(n log n) build, O(1) query) and a co-partitioned
  * two-sided exec; that stays on the join path until a fixture demands
  * it. Keyed (equi + band) extrema also decline here: a running-last
  * must RESET at key-run boundaries (the count/sum cancellation
  * argument does not apply to last-value), which needs per-row key
  * comparison in the exec. */
object RangeExtrema {

  private def dbl(e: Expression): Expression =
    Add(Cast(e, DoubleType), Literal(0.0))

  private def orderExact(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** One single-extreme plan: emits per-group
    * `Max(valid predecessor)` rows — the MAX of FINITE-OR-±∞ (never
    * NaN) `pt ∈ [lo, hi]` per carried key, pre-Filter (null = group
    * has no such point). `neg = true` computes the MIN via negation.
    *
    * NaN points are excluded from BOTH streams here: arithmetic
    * negation reverses the total order on [−∞, +∞] but NOT at NaN
    * (−NaN = NaN still sorts last), so the negated stream would place
    * NaN points where the min scan cannot see them. The operator layer
    * re-attaches the NaN-qualifying groups (hi = NaN intervals × any
    * NaN point existing) from two tiny aggregates — see
    * [[graft.ops.RangeAgg.extremaInRangeAgg]]. NaN BOUNDS are handled
    * in-plan: a NaN-hi probe in the max plan sits after every finite
    * point (correct upper limit = everything) with its validity
    * comparison untouched; in the min plan the carried lower bound
    * maps NaN-hi to −∞ (pt ≤ NaN is vacuously true for finite points),
    * and a NaN-lo probe self-excludes in both plans (finite pred ≥ NaN
    * is false — only NaN points satisfy pt ≥ NaN, and those are the
    * operator layer's branch).
    *
    * Output: carryKeys ++ [ext: double]. */
  private def singleExtreme(carryKeys: Seq[Attribute],
                            pt: Expression, lower: Expression,
                            upper: Expression, lowerStrict: Boolean,
                            upperStrict: Boolean, neg: Boolean,
                            ptPlan: LogicalPlan, ivPlan: LogicalPlan,
                            extName: String): (LogicalPlan, Alias) = {
    def img(e: Expression): Expression =
      if (neg) UnaryMinus(dbl(e)) else dbl(e)
    // domain mapping: the negated stream's UPPER end is the original
    // LOWER bound (min{pt ∈ [lo, hi]} = −max{−pt ∈ [−hi, −lo]}) — the
    // probe sits at the stream position of the negated-domain upper,
    // and the validity constraint comes from the other bound
    val probeSrc = if (neg) lower else upper
    val probeStrict = if (neg) lowerStrict else upperStrict
    val validSrc = if (neg) upper else lower
    val validStrict = if (neg) upperStrict else lowerStrict
    // inclusive → probe after equal-valued points (tag 2), strict →
    // before (tag 0): its predecessor is the candidate answer
    val probeTag = Literal(if (probeStrict) 0 else 2)
    // non-empty band filter, same as the prefix plan: strict-strict
    // degenerate [x, x] matches nothing
    val keep =
      if (lowerStrict && upperStrict) LessThan(dbl(lower), dbl(upper))
      else LessThanOrEqual(dbl(lower), dbl(upper))
    val ivF = Filter(keep, ivPlan)
    // the validity bound carried on the probe: in the negated (min)
    // plan the original constraint is pt ≤ hi, whose image would be
    // −NaN = NaN for a NaN hi — map it to −∞ instead (vacuously true
    // for every finite point, exactly like the original constraint)
    val carriedLower: Expression =
      if (neg) If(IsNaN(dbl(validSrc)), Literal(Double.NegativeInfinity),
        UnaryMinus(dbl(validSrc)))
      else dbl(validSrc)
    val probes = Project(Seq(Alias(img(probeSrc), "_graft_v")(),
      Alias(probeTag, "_graft_tag")(),
      Alias(Literal(1), "_graft_probe")()) ++
      carryKeys ++
      Seq(Alias(carriedLower, "_graft_lo")()), ivF)
    val ptF = Filter(And(IsNotNull(pt), Not(IsNaN(dbl(pt)))), ptPlan)
    val points = Project(Seq(Alias(img(pt), "_graft_v")(),
      Alias(Literal(1), "_graft_tag")(),
      Alias(Literal(0), "_graft_probe")()) ++
      carryKeys.map(ka => Alias(Literal(null, ka.dataType), ka.name)()) ++
      Seq(Alias(Literal(null, DoubleType), "_graft_lo")()), ptF)
    // probes FIRST: Union takes output attributes from its head child,
    // so the carried keys keep their original exprIds
    val union = Union(Seq(probes, points), byName = false,
      allowMissingCol = false)
    val predOut = AttributeReference("_graft_pred", DoubleType,
      nullable = true)()
    val node = RangeExtremaNode(carryKeys.length, predOut, union)
    // row-local validity: pred within the lower bound (in the possibly
    // negated image); invalid/empty probes contribute null, which Max
    // ignores — exactly the join form's membership
    val loAttr = node.output(carryKeys.length) // the carried _graft_lo
    val validCmp =
      if (validStrict) GreaterThan(predOut, loAttr)
      else GreaterThanOrEqual(predOut, loAttr)
    val valid = If(And(IsNotNull(predOut), validCmp), predOut,
      Literal(null, DoubleType))
    val extRaw = AggregateExpression(Max(valid), Complete,
      isDistinct = false)
    val ext = Alias(if (neg) UnaryMinus(extRaw) else extRaw, extName)()
    (Aggregate(carryKeys, (carryKeys: Seq[NamedExpression]) :+ ext, node),
      ext)
  }

  /** One single-extreme plan for the operator layer: per carried key,
    * MAX of `pt ∈ [lo, hi]` (inclusive both ends) when `neg = false`,
    * MIN when `neg = true` — keys with zero qualifying points dropped
    * (inner semantics). Output: keyAttrs ++ [extName: double]. The
    * caller composes min+max through the DataFrame join API (analyzer
    * self-join dedup handles the shared lineage; a raw logical Join of
    * the two branches would collide exprIds). None when pt/lo/hi are
    * not double-order-exact. */
  def tryBuildSingle(keyAttrs: Seq[Attribute], pt: Expression,
                     lo: Expression, hi: Expression, neg: Boolean,
                     ptPlan: LogicalPlan, ivPlan: LogicalPlan,
                     extName: String): Option[LogicalPlan] = {
    if (!Seq(pt, lo, hi).forall(orderExact)) return None
    if (!Seq(pt, lo, hi).forall(_.deterministic)) return None
    val (plan, ext) = singleExtreme(keyAttrs, pt, lo, hi,
      lowerStrict = false, upperStrict = false, neg = neg,
      ptPlan, ivPlan, extName)
    Some(Filter(IsNotNull(ext.toAttribute), plan))
  }
}

/** Merged-stream predecessor node. Child layout (positional):
  * [v: double, tag: int, probe: int, key_0..m-1, lo: double].
  * Output: the m carried keys + lo (pass-through) followed by the
  * running last point value (`pred`), ONE ROW PER PROBE. */
case class RangeExtremaNode(nKeys: Int, predOut: AttributeReference,
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output.slice(3, 3 + nKeys + 1) :+ predOut
  override def producedAttributes: AttributeSet = AttributeSet(Seq(predOut))
  // positional layout: every child column is required (see
  // RangeAggPrefixNode for why ColumnPruning must be blocked)
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : RangeExtremaNode = copy(child = newChild)
}

/** Physical predecessor scan: requires the child range-sorted on
  * (v, tag); job 1 collects one (hasPoint, lastV) per partition, job 2
  * re-reads the same shuffle output seeded with each partition's
  * predecessor-so-far and emits one row per probe. */
case class RangeExtremaExec(nKeys: Int, predOut: AttributeReference,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    child.output.slice(3, 3 + nKeys + 1) :+ predOut

  override def producedAttributes: AttributeSet = AttributeSet(Seq(predOut))

  override def nodeName: String = "RangeExtrema"

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

  override protected def doExecute(): RDD[InternalRow] = {
    val m = nKeys + 1 // carried keys + the lo column
    val childOut = child.output
    require(childOut(0).dataType == DoubleType &&
      childOut(1).dataType == IntegerType &&
      childOut(2).dataType == IntegerType,
      s"RangeExtrema child layout violated: ${childOut.take(3)}")
    val keyTypes = childOut.slice(3, 3 + m).map(_.dataType).toArray
    val outTypes = (keyTypes :+ (DoubleType: DataType)).toArray
    val rdd = child.execute()
    val nParts = rdd.getNumPartitions

    // job 1: per-partition last point value (order matters here, unlike
    // the prefix totals — the per-partition sort re-runs; the expensive
    // range exchange is reused, same trade as RangeAggPrefix job 1)
    val partLast: Array[(Int, Boolean, Double)] = rdd.mapPartitions { it =>
      var has = false
      var last = 0.0
      it.foreach { row =>
        if (row.getInt(2) == 0) { has = true; last = row.getDouble(0) }
      }
      Iterator.single((TaskContext.getPartitionId(), has, last))
    }.collect()

    // seed for partition p = last point value in any preceding partition
    val seedHas = new Array[Boolean](nParts)
    val seedVal = new Array[Double](nParts)
    var runHas = false
    var runVal = 0.0
    partLast.sortBy(_._1).foreach { case (pid, has, last) =>
      seedHas(pid) = runHas
      seedVal(pid) = runVal
      if (has) { runHas = true; runVal = last }
    }

    // job 2: same shuffle output, seeded running last; emit per probe
    rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var has = seedHas(pid)
      var last = seedVal(pid)
      val proj = UnsafeProjection.create(outTypes)
      val out = new GenericInternalRow(m + 1)
      it.flatMap { row =>
        if (row.getInt(2) == 0) {
          has = true; last = row.getDouble(0)
          Iterator.empty
        } else {
          var i = 0
          while (i < m) {
            out.update(i, if (row.isNullAt(3 + i)) null
              else row.get(3 + i, keyTypes(i)))
            i += 1
          }
          out.update(m, if (has) last else null)
          Iterator.single[InternalRow](proj(out))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : RangeExtremaExec = copy(child = newChild)
}
