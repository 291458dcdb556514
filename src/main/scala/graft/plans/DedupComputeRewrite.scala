package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the J3 dedup-compute trick (SURVEY §4 — distinct the
  * key, run the expensive projection once per DISTINCT value, join the
  * result back) applied automatically to any Project that evaluates an
  * expensive deterministic expression over a low-cardinality column:
  *
  *   Project(child.output ++ [x := f(k)], child)
  *     ⇒
  *   Project(original output,
  *     Join(child,
  *          Project([k' , x := f(k')],
  *            Aggregate(k, [k' := k], child)),        -- distinct keys
  *          Inner, k <=> k'))
  *
  * The reference runs exactly this by hand for its flagship (cluster 589
  * DISTINCT messages, apply labels to all 2826 — README.md:43); the
  * explicit operator is `Relational.dedupCompute` (the j3 query). The
  * rule makes the NAIVE formulation — a user mapping a heavy kernel
  * straight over the column — plan into the dedup form, the same
  * promotion j7b gives the naive band join.
  *
  * Per-row cost drops from n·cost(f) to distinct(k)·cost(f) plus a hash
  * join against a dimension of distinct(k) rows (broadcast by AQE/stats
  * when small). The right branch re-scans `child` but column-prunes to
  * the key alone, so at 100 TB the second scan reads one column and the
  * expensive kernel runs once per distinct value instead of per row.
  *
  * Fires only when `spark.graft.dedupCompute.enabled` is true — whether
  * distinct(k) ≪ n is a DATA decision (over a near-unique key the
  * rewrite is a pure loss), the same reasoning that keeps the range-join
  * rewrite behind its width conf.
  *
  * Guards (all must hold, else the plan is untouched):
  *  - the expensive alias is deterministic, references at least one and
  *    only child attributes; "expensive" = contains a graft.* native
  *    kernel, a ScalaUDF (always interpreted), a regexp/levenshtein
  *    class builtin, or a JSON-parse builtin;
  *  - `child` is itself fully deterministic (it appears on both sides of
  *    the rewritten join) and not streaming; subqueries anywhere under
  *    `child` also bail — `InSubquery.deterministic` only inspects the
  *    outer-reference children, not the subquery's own plan, so a
  *    `WHERE id IN (SELECT … WHERE rand() < p)` would pass the
  *    expression-level guard yet draw different rows on the two copies
  *    of `child`, and the inner join-back would silently drop rows;
  *  - `child` is not already distinct on the key (an Aggregate whose
  *    grouping covers the refs) — the semantics guard that also makes
  *    the rule idempotent: the rewritten compute-branch Project sits
  *    exactly on such an Aggregate.
  */
object DedupComputeRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.dedupCompute.enabled", "false")
      .equalsIgnoreCase("true")

  /** One node that justifies hoisting the whole expression behind a
    * distinct: a graft native kernel (tokenization cascades, fuzzy
    * ratios, minhash, lang-id — all real per-row work), any ScalaUDF
    * (interpreted, never codegen'd), or the heavy builtins. */
  private def expensiveNode(e: Expression): Boolean = e match {
    case _: ScalaUDF => true
    case _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll => true
    case _: Levenshtein => true
    // per-row JSON parsing — the classic expensive projection over a
    // low-cardinality column (log `props` fields repeat endlessly; the
    // p3 query's predicate is unpushable for exactly this reason).
    // Pays when the documents are real log JSON (KBs); measured
    // breakeven-to-loss on toy single-key strings (Scale9 `dedupc`
    // cheapJson rows) — part of why the rule is opt-in per session
    case _: GetJsonObject | _: JsonTuple | _: JsonToStructs => true
    case other => other.getClass.getName.startsWith("graft.")
  }

  private def isExpensive(e: Expression): Boolean = e.exists(expensiveNode)

  /** Attributes of `plan`'s output that are (aliases of) its grouping
    * expressions — rows are distinct on any subset of these. */
  private def distinctOutputs(plan: LogicalPlan): AttributeSet = plan match {
    case agg: Aggregate =>
      AttributeSet(agg.aggregateExpressions.collect {
        case a @ Alias(c, _)
          if agg.groupingExpressions.exists(_.semanticEquals(c)) =>
          a.toAttribute
        case ar: Attribute
          if agg.groupingExpressions.exists(_.semanticEquals(ar)) => ar
      })
    case _ => AttributeSet.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(list, child)
          if !child.isStreaming &&
            child.find(_.expressions.exists(e =>
              !e.deterministic ||
                e.exists(_.isInstanceOf[SubqueryExpression]))).isEmpty =>
        val alreadyDistinct = distinctOutputs(child)
        val expensive = list.collect {
          case a @ Alias(e, _)
              if isExpensive(e) && e.deterministic &&
                e.references.nonEmpty &&
                e.references.subsetOf(child.outputSet) &&
                !e.references.subsetOf(alreadyDistinct) &&
                // the refs become grouping + join keys: both need an
                // orderable type (maps aren't groupable)
                e.references.forall(r => RowOrdering.isOrderable(r.dataType)) =>
            a
        }
        if (expensive.isEmpty) p
        else {
          // one join-back per distinct key set (usually exactly one)
          val groups = expensive.groupBy(_.references)
          val joined = groups.foldLeft(child: LogicalPlan) {
            case (left, (refs, aliases)) =>
              val keys = refs.toSeq
              // fresh ids for the compute branch so the join's two sides
              // never share attributes
              val keyAliases = keys.map(k => Alias(k, k.name)())
              val agg = Aggregate(keys, keyAliases, child)
              val mapping = keys.map(_.exprId).zip(keyAliases.map(_.toAttribute)).toMap
              val computed = aliases.map { a =>
                val remapped = a.child.transform {
                  case ar: AttributeReference if mapping.contains(ar.exprId) =>
                    mapping(ar.exprId)
                }
                Alias(remapped, a.name)(exprId = a.exprId,
                  qualifier = a.qualifier)
              }
              val dim = Project(keyAliases.map(_.toAttribute) ++ computed, agg)
              val cond = keys.zip(keyAliases.map(_.toAttribute))
                .map { case (l, r) => EqualNullSafe(l, r) }
                .reduceLeft[Expression](And)
              Join(left, dim, Inner, Some(cond), JoinHint.NONE)
          }
          val expensiveIds = expensive.map(_.exprId).toSet
          val outList = list.map {
            case a: Alias if expensiveIds.contains(a.exprId) => a.toAttribute
            case other => other
          }
          Project(outList, joined)
        }
    }
  }
}
