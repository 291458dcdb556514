package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure band (interval-containment) inner join
  *
  *   Join(points, intervals, Inner, pt >= lo AND pt <= hi)
  *
  * into the bin-bucketed equi-join `Relational.rangeJoinPoints` builds by
  * hand — Spark plans the bare inequality condition as
  * BroadcastNestedLoopJoin (O(points × intervals) comparisons), while the
  * rewritten join hash-partitions on `floor(x / W)` and keeps the
  * original band predicate as the exact post-join filter:
  *
  *   Project(original output)
  *     Join(..., Inner, binL = binR AND pt >= lo AND pt <= hi)
  *       Project(points + binL := floor(pt / W))
  *       Generate(explode(sequence(floor(lo/W), floor(hi/W))) as binR,
  *         Filter(lo <= hi, intervals))
  *
  * The rewrite fires only when `spark.graft.rangeJoin.binWidth` is set to
  * a positive width (bin sizing is a data decision — a width far below
  * the interval length explodes replication, far above it degrades to a
  * few giant bins; no safe universal default exists).
  *
  * Guards (all must hold, else the plan is untouched):
  *  - inner join whose condition is EXACTLY two conjuncts, one lower and
  *    one upper bound on the same point expression (any of >=, >, <=, <
  *    in either literal order);
  *  - the point expression references exactly one join side, both bounds
  *    the other side — and the two bounds the SAME side;
  *  - every involved expression is numeric (cast-to-double safe).
  *
  * Strict bounds are accepted because the ORIGINAL condition is kept
  * verbatim after the bin equality: binning only prunes candidates, the
  * band predicate still decides membership.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** One conjunct decomposed as (point, bound, pointIsLowerBounded). */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Some((a, b, true))
      case GreaterThan(a, b) => Some((a, b, true))
      case LessThanOrEqual(a, b) => Some((a, b, false))
      case LessThan(a, b) => Some((a, b, false))
      case _ => None
    }

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

  private def binOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString("spark.graft.rangeJoin.binWidth", "")
      .toDoubleOption.getOrElse(0.0)
    // `w <= 0` alone lets NaN/Infinity through ("NaN".toDouble parses,
    // NaN <= 0 is false) — floor(x/NaN) puts EVERYTHING in one bin, a
    // plan strictly worse than the nested loop being replaced
    if (!(w > 0) || w.isNaN || w.isInfinite) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) =>
        val rewritten = for {
          b1 <- asBound(c1)
          b2 <- asBound(c2)
          r <- rewriteIfBand(j, left, right, hint, w, Seq(b1, b2))
        } yield r
        rewritten.getOrElse(j)
    }
  }

  /** Given the two decomposed conjuncts of an Inner join, build the
    * binned join when they form a band over one point expression. */
  private def rewriteIfBand(j: Join, left: LogicalPlan, right: LogicalPlan,
                            hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
                            w: Double,
                            raw: Seq[(Expression, Expression, Boolean)])
      : Option[LogicalPlan] = {
    // Both orientations of a conjunct can be side-valid (the point and
    // the bound each reference exactly one side), so the right pairing
    // is only decidable jointly: try every orientation combination and
    // take the first that forms a band (same point, one lower + one
    // upper bound, bounds on the opposite side of the point).
    def orientations(dec: (Expression, Expression, Boolean))
        : Seq[(Expression, Expression, Boolean)] = {
      val (a, b, lower) = dec
      Seq((a, b, lower), (b, a, !lower)).filter { case (pt, bound, _) =>
        (sideOf(pt, left, right), sideOf(bound, left, right)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      }
    }
    val bands = for {
      (ptA, boundA, lowerA) <- orientations(raw.head)
      (ptB, boundB, lowerB) <- orientations(raw(1))
      if ptA.semanticEquals(ptB) && lowerA != lowerB
    } yield if (lowerA) (ptA, boundA, boundB) else (ptA, boundB, boundA)
    if (bands.isEmpty) return None
    val (ptA, lo, hi) = bands.head
    if (!Seq(ptA, lo, hi).forall(numeric)) return None
    val ptOnLeft = sideOf(ptA, left, right).getOrElse(return None)
    if (sideOf(lo, left, right).contains(ptOnLeft) ||
      sideOf(hi, left, right).contains(ptOnLeft)) return None
    val (ptPlan, ivPlan) = if (ptOnLeft) (left, right) else (right, left)

    val binL = Alias(binOf(ptA, w), "_graft_bin_pt")()
    val ptBinned = Project(ptPlan.output :+ binL, ptPlan)
    // REPLICATION BOUND: the conf is session-wide, so one width serves
    // EVERY band join while it is set — an unrelated join whose
    // intervals span a huge number of bins would generate enormous
    // per-row arrays (Sequence errors past ~2^31 elements) or OOM,
    // turning a slow-but-working nested loop into a failure. The upper
    // bin passes through a per-row guard that RAISES A CLEAR ERROR when
    // an interval would explode into more than
    // spark.graft.rangeJoin.maxBinsPerInterval bins (default 1e6) —
    // semantics-preserving (no silent truncation), and the error names
    // the knobs to fix. Null spans pass through: the lo<=hi filter
    // already dropped null bounds.
    val maxBins = conf
      .getConfString("spark.graft.rangeJoin.maxBinsPerInterval", "1000000")
      .toLongOption.filter(_ > 0).getOrElse(1000000L)
    val span = Subtract(binOf(hi, w), binOf(lo, w))
    val guardMsg = Literal(
      s"graft range-join rewrite: an interval spans more than $maxBins " +
        s"bins at binWidth=$w - raise spark.graft.rangeJoin.binWidth, " +
        "raise spark.graft.rangeJoin.maxBinsPerInterval, or unset the " +
        "binWidth conf for this join")
    // strict LessThan: span bins [lo..hi] explode into span+1 rows, so
    // span == maxBins already means maxBins+1 bins — over the cap
    val hiGuarded = If(
      Or(IsNull(span), LessThan(span, Literal(maxBins))),
      binOf(hi, w),
      Cast(new RaiseError(guardMsg), LongType))
    // Sequence is TimeZoneAware: without an explicit zone the rewritten
    // plan is UNRESOLVED and the optimizer's plan validation rejects it
    val gen = Explode(Sequence(binOf(lo, w), hiGuarded, None,
      Some(conf.sessionLocalTimeZone)))
    val binROut = AttributeReference("_graft_bin_iv", LongType,
      nullable = gen.elementSchema.head.nullable)()
    val ivFiltered = Filter(LessThanOrEqual(lo, hi), ivPlan)
    val ivBinned = Generate(gen,
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binROut), child = ivFiltered)
    val (newL, newR) =
      if (ptOnLeft) (ptBinned, ivBinned) else (ivBinned, ptBinned)
    val newCond = And(EqualTo(binL.toAttribute, binROut), j.condition.get)
    Some(Project(j.output, Join(newL, newR, Inner, Some(newCond), hint)))
  }
}
