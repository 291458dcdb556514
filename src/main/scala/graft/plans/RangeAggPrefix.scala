package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, UnaryNode, Union}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Join-free per-interval range aggregation as a first-class plan
  * (r17: the j7b ×100 finding — VERDICT r16 Next #1).
  *
  * The band-join fixture is OUTPUT-BOUND quadratic: every ×10 in rows is
  * ×100 in qualifying (point, interval) pairs (1.86M → 186M → 18.6B at
  * sf0.1/sf1/sf10), so ANY pair-enumerating plan — the binned equi-join,
  * DuckDB's IEJoin, a 1000-executor cluster's shuffle join — pays wall
  * time linear in the pair count (measured: 910–1502 s at ×100). When
  * the downstream question is a per-interval COUNT/SUM, the pairs are
  * never needed: merge points and interval endpoints into one
  * value-ordered stream and difference two prefix sums per interval —
  * O((n+q) log) with output linear in q, at any density.
  *
  * Plan shape (all but one node standard Catalyst, so Tungsten does the
  * heavy lifting):
  *
  *   Project(original aggregate output)
  *     Filter(_graft_pair_cnt > 0)              // inner-join semantics
  *       Aggregate(group keys, remapped aggs)
  *         RangeAggPrefixNode                   // custom: prefix stitch
  *           Union                              // merged event stream
  *             Project(lo-probe)  Filter(nonempty band, intervals)
  *             Project(hi-probe)  Filter(nonempty band, intervals)
  *             Project(point)     Filter(pt not null, points)
  *
  * The custom exec declares `OrderedDistribution(v, tag)`, so
  * EnsureRequirements inserts the stock RANGE ShuffleExchange + SortExec
  * (sampled range partitioner, UnsafeRow shuffle, codegen sort — the
  * same machinery a global ORDER BY uses). The exec itself then runs
  * two passes over the sorted child: job 1 collects one tiny
  * per-partition totals row (the only driver sync — the same bounded
  * state a RangePartitioner's sample job carries), job 2 re-reads the
  * SAME shuffle output (exchange reuse; only the cheap per-partition
  * sort re-runs) seeded with exclusive per-partition offsets and emits
  * one row per PROBE: the interval's carried key columns plus its
  * SIGNED global running totals (lo-probe −P, hi-probe +P).
  *
  * Signed probes make the final Aggregate duplicate-safe BY
  * CONSTRUCTION: a group's value is Σ over its probe rows of ±P, which
  * telescopes to Σ over interval INSTANCES of (P(hi) − P(lo)) — two
  * interval rows sharing a key contribute the sum of their individual
  * answers, exactly what aggregate-over-join computes (this closes the
  * r16 ADVICE unique-id caveat for every caller of the prefix path).
  *
  * Tag order pins inclusivity at equal values: an INCLUSIVE lo-probe
  * (tag 0) sorts BEFORE points (tag 1), an inclusive hi-probe (tag 2)
  * AFTER — so P(hi) − P(lo) counts lo ≤ v ≤ hi exactly; a STRICT bound
  * flips its probe to the other side of the points. Strict-strict
  * intervals with lo == hi are dropped up front (their telescoped
  * contribution would be −|pts == v| where the join form yields 0).
  *
  * Exactness contract: counts and decimal-sum contributions accumulate
  * as LONGS (unscaled cents for `sum(cast(x as decimal(p ≤ 18, s)))`),
  * so every prefix is order- and partitioning-independent and the
  * answer is bit-identical to the join form. Plain DOUBLE sums are
  * declined (re-association drifts). 64-bit accumulator overflow raises
  * a named error rather than wrapping — note the bound is the
  * CORPUS-WIDE running prefix (every point's contribution across the
  * whole stream passes through one running total), not the per-group
  * sum: a query whose per-group answers are tiny still fails loudly
  * once the corpus total of a sum column passes ~9.2e18 unscaled
  * units, where the pair-join plan would have succeeded — the error
  * names spark.graft.rangeJoin.aggPrefix=false as the escape hatch.
  * (A wrapped-mod-2^64 prefix would be bit-identical to the join form
  * for INTEGRAL sums in non-ANSI mode, but silently wrong for decimal
  * sums whose per-group totals exceed a long — loud is the only
  * answer that is never silently wrong for every supported shape.)
  * Values are ordered by their DOUBLE image, so the rewrite only fires
  * for types whose double cast is order- and equality-exact
  * (double/float/int and narrower); −0.0 is normalized to +0.0 (SQL
  * comparison says they're equal, IEEE sort says they're not); NaN
  * needs no normalization — Spark's nan-safe sort (NaN greatest,
  * NaN = NaN) makes probe tag order reproduce SQL's NaN comparison
  * semantics exactly, so NaN points and NaN bounds both take the
  * prefix path.
  *
  * 100 TB story: one range exchange of n+2q skinny rows, two linear
  * passes, driver state = numPartitions × nAcc longs. No pair is ever
  * materialized, so cost is independent of band density — the measured
  * ×100 gap vs the pair join is 26 s vs 910–1502 s.
  */
object RangeAggPrefix {

  /** One accumulator: a per-point contribution expression (LongType)
    * and the exec-output attribute carrying its signed prefix. */
  private case class Acc(contrib: Expression, out: AttributeReference)

  /** Double image that normalizes −0.0 to +0.0 (NaN and everything
    * else unchanged — IEEE: −0.0 + 0.0 = +0.0). */
  private def dbl(e: Expression): Expression =
    Add(Cast(e, DoubleType), Literal(0.0))

  /** Types whose cast to double is order- AND equality-exact. */
  private def orderExact(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Types an equi-key column may have: the keyed prefix turns `=` into
    * sort CONTIGUITY, so sort equality must coincide with SQL equality.
    * That holds for every fixed-width atomic, binary-collated strings,
    * and decimals; floats/doubles need −0.0 normalized (Double.compare
    * distinguishes −0.0 < 0.0 where SQL says equal — NaN is fine: all
    * NaNs compare equal in both orders, and Spark SQL's `=` says
    * NaN = NaN too). Anything else (collated strings, arrays, structs,
    * intervals) declines to the join path. */
  private[plans] def sortKeyExact(e: Expression): Boolean = e.dataType match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType => true
    case s: StringType => s == StringType // UTF8_BINARY default only
    case _ => false
  }

  /** Sort image of an equi key: float/double get the −0.0 → +0.0
    * normalization (the [[dbl]] trick, in the key's own type so the
    * value set is unchanged); every other allowed type already sorts
    * exactly as SQL compares. */
  private[plans] def normKey(e: Expression): Expression = e.dataType match {
    case DoubleType => Add(e, Literal(0.0))
    case FloatType => Add(e, Literal(0.0f))
    case _ => e
  }

  /** Build the join-free prefix plan for
    * `Aggregate(groupExprs, aggExprs)` over the band join
    * `ptPlan ⋈ ivPlan ON lo (<|<=) pt AND pt (<|<=) hi`
    * — optionally KEYED: with `equiKeys = Seq((ptK, ivK), ...)` the
    * join is `ptK = ivK AND ... AND lo (<|<=) pt AND pt (<|<=) hi`
    * (the "events inside each session's [start, end]" shape). The
    * stream sorts by (key..., v, tag) instead of (v, tag): each key's
    * rows become one contiguous run, and the UNCHANGED global-prefix
    * stitch is still exact — points of a smaller key sort before BOTH
    * probes of any interval of this key (contributing equally to
    * P(lo) and P(hi), cancelling in the difference), points of a
    * larger key sort after both (contributing to neither), so
    * P(hi) − P(lo) counts exactly the same-key in-band points. Rows
    * with a NULL key are filtered on both sides (SQL `=` never
    * matches null); NaN keys match each other (Spark `=` says
    * NaN = NaN, and every sort puts all NaNs in one run); −0.0 keys
    * are normalized to +0.0 in the sort image (Double.compare would
    * split the run SQL equality says is one).
    *
    * Returns None when any guard fails (caller falls back to the pair
    * join):
    *  - pt/lo/hi double-exact types; equi keys sort-exact types (see
    *    [[sortKeyExact]]), both sides of a pair the same type;
    *  - every group key an interval-side Attribute;
    *  - every aggregate one of: count(non-null literal), count(pt-side
    *    expr), sum(cast(pt-side expr as decimal(p ≤ 18, s))), sum of an
    *    integral pt-side expr — non-distinct, unfiltered;
    *  - no other point-side reference anywhere in the output.
    * Output attribute exprIds are PRESERVED, so the caller can splice
    * the result over the original aggregate without touching parents. */
  def tryBuild(groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
               pt: Expression, lo: Expression, hi: Expression,
               loStrict: Boolean, hiStrict: Boolean,
               ptPlan: LogicalPlan, ivPlan: LogicalPlan,
               equiKeys: Seq[(Expression, Expression)] = Nil)
      : Option[LogicalPlan] = {
    if (!Seq(pt, lo, hi).forall(orderExact)) return None
    if (!Seq(pt, lo, hi).forall(_.deterministic)) return None
    if (!equiKeys.forall { case (pk, ik) =>
          pk.deterministic && ik.deterministic &&
          sortKeyExact(pk) && sortKeyExact(ik) &&
          pk.dataType == ik.dataType }) return None
    val ivOut = ivPlan.outputSet
    val ptOut = ptPlan.outputSet
    val keyAttrs: Seq[Attribute] = groupExprs.map {
      case a: Attribute if ivOut.contains(a) => a
      case _ => return None
    }
    val carryKeys = keyAttrs.distinct

    val accs = ArrayBuffer.empty[Acc]
    def accFor(contrib: Expression): Attribute =
      accs.find(_.contrib.semanticEquals(contrib)) match {
        case Some(a) => a.out
        case None =>
          val out = AttributeReference(s"_graft_acc${accs.length}",
            LongType, nullable = false)()
          accs += Acc(contrib, out)
          out
      }
    // acc 0 is always the qualifying-pair count (the existence filter)
    val pairAcc = accFor(Literal(1L))
    def sumOf(a: Attribute): Expression =
      AggregateExpression(Sum(a), Complete, isDistinct = false)
    // non-null-pair existence for an expression (count(e)/sum(e) skip
    // nulls); a non-nullable e shares the pair counter
    def nnAcc(e: Expression): Attribute =
      if (e.nullable) accFor(If(IsNull(e), Literal(0L), Literal(1L)))
      else pairAcc
    def sawAny(e: Expression): Expression =
      GreaterThan(sumOf(nnAcc(e)), Literal(0L))

    // count() over an empty group is 0, never null — matters only for
    // the GLOBAL-aggregate shape (grouped output rows always hold ≥2
    // probe rows), where zero qualifying pairs must yield one
    // (0, null, ...) row exactly as aggregate-over-inner-join does
    def countOf(a: Attribute): Expression =
      Coalesce(Seq(sumOf(a), Literal(0L)))
    def mapAggFn(ae: AggregateExpression): Option[Expression] = {
      // DISTINCT aggregates are declined BY DESIGN, not omission: a
      // deduplicated-points prefix would make count(DISTINCT pt) exact
      // per interval INSTANCE, but instances sharing a group key SUM
      // their prefix differences while SQL's DISTINCT unions values
      // across them — exact support needs per-group interval-union
      // merging (and per-accumulator probe classes), which is not a
      // prefix difference. Same for FILTER clauses: the filter may
      // reference both sides.
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(cs) if cs.nonEmpty &&
            cs.forall(c => c.foldable && c.eval() != null) =>
          Some(countOf(pairAcc))
        case Count(Seq(e)) if e.deterministic && e.references.nonEmpty &&
            e.references.subsetOf(ptOut) =>
          Some(countOf(nnAcc(e)))
        case s: Sum if s.child.deterministic &&
            s.child.references.nonEmpty &&
            s.child.references.subsetOf(ptOut) =>
          val e = s.child
          e.dataType match {
            case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
              // exact: per-row unscaled units fit a long at p ≤ 18; the
              // running total overflows loudly in the exec, never wraps
              val unscaled: Expression =
                if (e.nullable) Coalesce(Seq(UnscaledValue(e), Literal(0L)))
                else UnscaledValue(e)
              val res = s.dataType.asInstanceOf[DecimalType]
              Some(If(sawAny(e),
                MakeDecimal(sumOf(accFor(unscaled)), res.precision, res.scale),
                Literal(null, res)))
            case LongType | IntegerType | ShortType | ByteType =>
              val v: Expression =
                if (e.nullable) Coalesce(Seq(Cast(e, LongType), Literal(0L)))
                else Cast(e, LongType)
              Some(If(sawAny(e), sumOf(accFor(v)), Literal(null, LongType)))
            // double/float sums are order-dependent: a prefix
            // re-association could drift a ulp — stay on the join path
            case _ => None
          }
        case _ => None
      }
    }

    var ok = true
    val mapped: Seq[NamedExpression] = aggExprs.map {
      case a: Attribute =>
        if (!keyAttrs.contains(a)) ok = false
        a
      case al: Alias =>
        val nt = al.child.transformUp {
          case ae: AggregateExpression =>
            mapAggFn(ae) match {
              case Some(r) => r
              case None => ok = false; ae
            }
        }
        Alias(nt, al.name)(al.exprId, al.qualifier, al.explicitMetadata,
          al.nonInheritableMetadataKeys)
      case other => ok = false; other
    }
    if (!ok) return None
    // anything still referencing the point side (or a non-key interval
    // column) outside a mapped aggregate means the shape isn't ours
    val legal = AttributeSet(carryKeys ++ accs.map(_.out))
    if (!mapped.forall(_.references.subsetOf(legal))) return None

    // equi keys: each pair must reference its own side only (the caller
    // decides orientation; this re-checks it)
    if (!equiKeys.forall { case (pk, ik) =>
          pk.references.nonEmpty && pk.references.subsetOf(ptOut) &&
          ik.references.nonEmpty && ik.references.subsetOf(ivOut) })
      return None

    // ---- merged event stream --------------------------------------
    // layout (positional contract with the exec):
    //   [0] v: double  [1] tag: int  [2] sign: int
    //   [3 .. 3+e) equi-key sort columns (iv side on probes, pt side
    //              on points — the columns `=` turns into contiguity)
    //   [3+e .. 3+e+m) carried interval key columns
    //   [3+e+m .. 3+e+m+k) per-point contribution columns (long)
    val zero = Literal(0L)
    // a strict-strict band with lo == hi matches nothing but would
    // telescope negative; every other empty/inverted/null band is
    // dropped by the same comparison going false-or-null
    val keepProbe0 =
      if (loStrict && hiStrict) LessThan(dbl(lo), dbl(hi))
      else LessThanOrEqual(dbl(lo), dbl(hi))
    // a null equi key never matches (SQL `=`): drop those rows up front
    // on BOTH sides — a kept null-key row would sort into the
    // nulls-first run and pair with other null-key rows
    val keepProbe = equiKeys.map(_._2).map(IsNotNull)
      .foldLeft[Expression](keepProbe0)(And(_, _))
    val loTag = Literal(if (loStrict) 2 else 0)
    val hiTag = Literal(if (hiStrict) 0 else 2)
    val ivF = Filter(keepProbe, ivPlan)
    def probeChild(bound: Expression, tag: Literal, sign: Int): Project =
      Project(Seq(Alias(dbl(bound), "_graft_v")(),
        Alias(tag, "_graft_tag")(),
        Alias(Literal(sign), "_graft_sign")()) ++
        equiKeys.zipWithIndex.map { case ((_, ik), i) =>
          Alias(normKey(ik), s"_graft_k$i")() } ++
        carryKeys ++
        accs.indices.map(i => Alias(zero, s"_graft_c$i")()), ivF)
    val probesLo = probeChild(lo, loTag, -1)
    val probesHi = probeChild(hi, hiTag, 1)
    // null point values never satisfy the band (SQL: NULL comparison is
    // NULL). NaN points STAY in the stream (r17 advice): under Spark's
    // TOTAL order NaN is greater than every value and equal to itself,
    // so a NaN point satisfies pt >= lo for ANY lo and pt <= hi exactly
    // when hi is NaN — and because the range sort places NaN rows after
    // all finite rows (mutually equal, tag breaking ties), the probe
    // tag order yields precisely that membership: an inclusive hi = NaN
    // probe (tag 2) sorts after NaN points and counts them, a strict
    // one (tag 0) sorts before and doesn't, and every finite probe
    // sorts before all NaN points. Dropping NaN points here would
    // silently undercount (NaN point, NaN hi) pairs vs the join form
    // (RangeAggSpec pins the parity with a nan-safe brute force).
    val ptF = Filter(equiKeys.map(_._1).map(IsNotNull)
      .foldLeft[Expression](IsNotNull(pt))(And(_, _)), ptPlan)
    val ptsChild = Project(Seq(Alias(dbl(pt), "_graft_v")(),
      Alias(Literal(1), "_graft_tag")(),
      Alias(Literal(0), "_graft_sign")()) ++
      equiKeys.zipWithIndex.map { case ((pk, _), i) =>
        Alias(normKey(pk), s"_graft_k$i")() } ++
      carryKeys.map(ka => Alias(Literal(null, ka.dataType), ka.name)()) ++
      accs.map(a => Alias(a.contrib, a.out.name)()), ptF)
    // probesLo FIRST: Union takes output attrs from its head child, so
    // the carried keys keep their ORIGINAL exprIds and the aggregate's
    // grouping expressions resolve unchanged
    val union = Union(Seq(probesLo, probesHi, ptsChild), byName = false,
      allowMissingCol = false)

    val node = RangeAggPrefixNode(equiKeys.length, carryKeys.length,
      accs.map(_.out).toSeq, union)
    val hidden = Alias(countOf(pairAcc), "_graft_pair_cnt")()
    val agg = Aggregate(keyAttrs, mapped :+ hidden, node)
    // inner-join semantics: a group exists iff it has ≥1 qualifying
    // pair. A GLOBAL aggregate always emits its one row — there the
    // zero-pair answer is (0, null, ...), which the remapped
    // count/sum expressions already produce, so no filter
    val filt =
      if (keyAttrs.isEmpty) agg
      else Filter(GreaterThan(hidden.toAttribute, Literal(0L)), agg)
    Some(Project(mapped.map(_.toAttribute), filt))
  }
}

/** Merged-event-stream prefix node. Child layout (positional):
  * [v: double, tag: int, sign: int, ek_0..e-1, key_0..m-1,
  *  c_0..k-1: long] — ek are the equi-key SORT columns (keyed form;
  * e = 0 for the plain band), key the carried interval columns.
  * Output: the m carried key columns (same attributes — pass-through)
  * followed by k signed-prefix columns, ONE ROW PER PROBE. */
case class RangeAggPrefixNode(nEquiKeys: Int, nKeys: Int,
                              accOut: Seq[AttributeReference],
                              child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output.slice(3 + nEquiKeys, 3 + nEquiKeys + nKeys) ++ accOut
  // the signed-prefix columns are BORN here (the child's contribution
  // columns are inputs, not the same attributes)
  override def producedAttributes: AttributeSet = AttributeSet(accOut)
  // the exec reads the child POSITIONALLY ([v, tag, sign, ekeys, keys,
  // contribs]) — every child column is required, or ColumnPruning would
  // slim the union under a count()-style parent and break the layout
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : RangeAggPrefixNode = copy(child = newChild)
}

/** Physical prefix stitch. Requires the child globally range-sorted on
  * (v, tag) — EnsureRequirements provides the stock sampled range
  * exchange + per-partition sort. Two passes over the SAME shuffled
  * child: job 1 per-partition contribution totals (one tiny row per
  * partition to the driver), job 2 emits each probe's key columns plus
  * sign × (partition offset + local running total). Job 1 re-runs the
  * per-partition SORT it doesn't strictly need (totals are
  * order-free) — deliberate: the expensive range EXCHANGE is reused
  * across both jobs (shuffle files persist), and routing job 1 around
  * the sort would need a second exchange of the full stream, which
  * costs far more than re-sorting each partition in memory. */
case class RangeAggPrefixExec(nEquiKeys: Int, nKeys: Int,
                              accOut: Seq[AttributeReference],
                              child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    child.output.slice(3 + nEquiKeys, 3 + nEquiKeys + nKeys) ++ accOut

  override def producedAttributes: AttributeSet = AttributeSet(accOut)

  override def nodeName: String = "RangeAggPrefix"

  // KEYED form: equi keys lead the sort, making each key one contiguous
  // run — the global prefix stitch below is then exact with NO code
  // change (other keys' points flank both probes of an interval and
  // cancel in the difference, or follow both and touch neither)
  private def streamOrder: Seq[SortOrder] =
    (0 until nEquiKeys).map(i =>
      SortOrder(child.output(3 + i), Ascending)) ++ Seq(
    SortOrder(child.output(0), Ascending),
    SortOrder(child.output(1), Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(streamOrder) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(streamOrder)

  // the range partitioning below is on (v, tag), neither of which
  // survives into the output — claim nothing
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    UnknownPartitioning(0)

  override protected def doExecute(): RDD[InternalRow] = {
    val k = accOut.length
    val m = nKeys
    val base = 3 + nEquiKeys // first carried-key ordinal
    val cBase = base + m     // first contribution ordinal
    val childOut = child.output
    require(childOut(0).dataType == DoubleType &&
      childOut(1).dataType == IntegerType &&
      childOut(2).dataType == IntegerType,
      s"RangeAggPrefix child layout violated: ${childOut.take(3)}")
    val keyTypes = childOut.slice(base, base + m).map(_.dataType).toArray
    val outTypes = (keyTypes ++ Array.fill(k)(LongType: DataType)).toArray
    val rdd = child.execute()
    val nParts = rdd.getNumPartitions

    // job 1: per-partition contribution totals (points only)
    val totals = rdd.mapPartitions { it =>
      val acc = new Array[Long](k)
      it.foreach { row =>
        if (row.getInt(2) == 0) {
          var i = 0
          while (i < k) {
            acc(i) = RangeAggPrefixExec.addX(acc(i), row.getLong(cBase + i))
            i += 1
          }
        }
      }
      Iterator.single((TaskContext.getPartitionId(), acc))
    }.collect()

    // exclusive per-partition offsets (driver state: nParts × k longs)
    val offsets = Array.fill(nParts)(new Array[Long](k))
    val running = new Array[Long](k)
    totals.sortBy(_._1).foreach { case (pid, t) =>
      offsets(pid) = running.clone()
      var i = 0
      while (i < k) {
        running(i) = RangeAggPrefixExec.addX(running(i), t(i)); i += 1
      }
    }

    // job 2: same shuffle output (exchange reuse), seeded running
    // totals; emit one output row per probe
    rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val run = offsets(pid).clone()
      val proj = UnsafeProjection.create(outTypes)
      val out = new GenericInternalRow(m + k)
      it.flatMap { row =>
        val sign = row.getInt(2)
        if (sign == 0) {
          var i = 0
          while (i < k) {
            run(i) = RangeAggPrefixExec.addX(run(i), row.getLong(cBase + i))
            i += 1
          }
          Iterator.empty
        } else {
          var i = 0
          while (i < m) {
            out.update(i, if (row.isNullAt(base + i)) null
              else row.get(base + i, keyTypes(i)))
            i += 1
          }
          var j = 0
          while (j < k) {
            out.update(m + j, if (sign > 0) run(j) else -run(j))
            j += 1
          }
          Iterator.single[InternalRow](proj(out))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : RangeAggPrefixExec = copy(child = newChild)
}

object RangeAggPrefixExec {
  /** Exact add: a silent wrap would corrupt every downstream prefix, so
    * overflow fails loudly with the escape hatch named. The bound is
    * the CORPUS-WIDE running total — every point's contribution passes
    * through one global prefix, so a query whose per-GROUP sums are
    * tiny still trips this once the whole corpus' sum column passes
    * 2^63 unscaled units (where the pair-join plan would succeed).
    * Deliberate: wrapping mod 2^64 would match the join form for
    * integral sums in non-ANSI mode but be silently wrong for decimal
    * sums whose group totals exceed a long, and loud-never-wrong wins. */
  private[plans] def addX(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch {
      case _: ArithmeticException => throw new ArithmeticException(
        "graft range-agg prefix: 64-bit accumulator overflow - the " +
          "CORPUS-WIDE total of a sum column passed 2^63 unscaled " +
          "units (the running prefix is global, so this can fire even " +
          "when every per-group sum is small); set " +
          "spark.graft.rangeJoin.aggPrefix=false to fall back to the " +
          "pair-join plan")
    }
}
