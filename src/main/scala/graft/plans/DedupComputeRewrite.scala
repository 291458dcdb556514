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
  * Gating (`spark.graft.dedupCompute.enabled`): whether distinct(k) ≪ n
  * is a DATA decision (over a near-unique key the rewrite is a pure
  * loss), so the default mode is COST-BASED (`auto`): the rule fires
  * only when Catalyst column statistics prove the Scale9-measured
  * break-even —
  *
  *   (n − d) · kernelNs  >  n · ProbeNs + FixedNs
  *
  * where n = child rowCount, d = estimated distinct keys
  * (min(∏ per-column distinctCount, n)), kernelNs = per-row cost of the
  * hoisted expressions estimated from the kernel class × the key
  * columns' avgLen, and ProbeNs/FixedNs are the rewrite's own measured
  * costs (one extra exchange + key-pruned rescan + join probe — Scale9
  * `dedupc` rows, COVERAGE.md). Missing statistics (no ANALYZE, or
  * spark.sql.cbo.enabled=false, so attributeStats don't propagate) fall
  * back to a bounded LIVE PROBE of the same inputs for scan-shaped
  * children under `probeMaxBytes` whose kernels have measured win
  * potential (r14 — see the probe block below); when neither source
  * knows the data, decline conservatively. `true` forces the rewrite
  * regardless of
  * stats (the pre-r13 behavior, and the j3b query's arm); `false`
  * disables it. Calibration (Scale9 `dedupc` at ×1/×10/×100): the
  * quadratic difflib kernel over 5k-distinct text wins 2–3× at dup
  * factor 100 but LOSES at ≤10 (fixed two-exchange cost), bit-parallel
  * levenshtein (~0.6 µs/row) and single-path probes of 9-char JSON
  * lose at every dup factor — the auto gate reproduces all five
  * verdicts from stats alone (DedupComputeRewriteSpec).
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

  /** "auto" (default) = cost-based on column stats; "true" = force;
    * anything else = off. */
  private def mode: String =
    conf.getConfString("spark.graft.dedupCompute.enabled", "auto")
      .toLowerCase(java.util.Locale.ROOT)

  /** Scale9 `dedupc` calibration (local[32], COVERAGE.md): the rewrite
    * adds ~1.2 s of fixed cost (the distinct exchange + the key-pruned
    * rescan's extra stage) plus ~1.5 µs/row of hash-join probe. At
    * cluster scale the fixed term is pessimistic (it amortizes over
    * executors), which only makes the auto gate more conservative. */
  private val ProbeNs = 1500.0
  private val FixedNs = 1.2e9

  /** Estimated per-row cost (ns) of one kernel node over key columns of
    * total average length `len` chars. Coefficients are backed out of
    * the Scale9 `dedupc` measurements: the difflib-parity SeqRatio ran
    * ~22 µs/row on ~300-char-per-side pairs (pairwise, ~0.25 ns per
    * char-PAIR — its cost is O(|a|·|b|), so each operand contributes
    * its OWN length: a long column against a short literal is cheap,
    * and squaring the column length alone would fire the rewrite on a
    * measured-loss shape); the bit-parallel levenshtein ~0.6 µs/row on
    * the same pairs; single-path JSON probes are a linear scan.
    * Unmeasured classes get conservative linear estimates — the conf
    * override exists for data that defies them. */
  private def operandLen(e: Expression, avgLen: Map[ExprId, Double],
                         groupLen: Double): Double =
    if (e.references.nonEmpty) {
      // length of the columns THIS operand actually touches — a binary
      // kernel's cost is |a|·|b|, so graft_seq_ratio(longCol, shortCol)
      // must cost lenA·lenB, not (lenA+lenB)² (summing both into each
      // side overestimated by orders of magnitude and fired the gate on
      // the measured-loss long-vs-short shape)
      val lens = e.references.toSeq.map(r => avgLen.get(r.exprId))
      if (lens.forall(_.isDefined)) lens.flatten.sum else groupLen
    } else e match {
      // foldable literal side: its length is statically known
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        s.numChars.toDouble
      case _ => 64.0
    }
  private def nodeCostNs(e: Expression, avgLen: Map[ExprId, Double],
                         groupLen: Double): Double = {
    def len(op: Expression) = operandLen(op, avgLen, groupLen)
    e match {
      case r: graft.expr.GraftSeqRatio => 0.25 * len(r.left) * len(r.right)
      case l: graft.expr.GraftLevenshtein =>
        0.007 * len(l.left) * len(l.right)
      case l: Levenshtein => 0.007 * len(l.left) * len(l.right)
      case _: ScalaUDF => 5000.0 + 20.0 * len(e)
      case _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll =>
        20.0 * len(e)
      case _: GetJsonObject | _: JsonTuple => 15.0 * len(e)
      case _: JsonToStructs => 25.0 * len(e)
      case other if other.getClass.getName.startsWith("graft.") =>
        30.0 * len(e)
      case _ => 0.0
    }
  }

  /** Catalog-statistics inputs for the cost decision: rowCount plus
    * per-key-column distinctCount+avgLen (ANALYZE TABLE … FOR COLUMNS
    * with spark.sql.cbo.enabled). Returns (n, d, avgLen by exprId). */
  private def statsInputs(child: LogicalPlan, refs: AttributeSet)
      : Option[(Double, Double, Map[ExprId, Double])] = {
    val st = child.stats
    val colStats = refs.toSeq.map(a => st.attributeStats.get(a))
    for {
      nBig <- st.rowCount
      if colStats.forall(cs =>
        cs.exists(c => c.distinctCount.isDefined && c.avgLen.isDefined))
    } yield {
      val n = nBig.toDouble
      val stats = colStats.flatten
      val d = math.min(
        stats.map(_.distinctCount.get.toDouble).product, n)
      val avgLen = refs.toSeq.flatMap(a =>
        st.attributeStats.get(a).flatMap(_.avgLen)
          .map(l => a.exprId -> l.toDouble)).toMap
      (n, d, avgLen)
    }
  }

  // --- stats-less fallback (r14, VERDICT r13 #4) --------------------
  // Plain `spark.read.parquet` without ANALYZE carries no
  // attributeStats, so the auto gate silently never benefited the most
  // common real shape. When stats are missing, a bounded PROBE job
  // computes the same inputs live — count, approx distinct, average
  // string length of the key columns, one column-pruned pass over
  // `child` — under tight eligibility so the probe itself can't become
  // the regression:
  //  * `spark.graft.dedupCompute.probe` on (default) and not already
  //    inside a probe (thread-local — the probe's own optimization
  //    would otherwise recurse);
  //  * `child` is a scan-shaped subtree (leaf/Filter/Project only):
  //    probing a join or aggregate would RUN it, doubling the work the
  //    gate is supposed to save;
  //  * the relation's size estimate is within
  //    `spark.graft.dedupCompute.probeMaxBytes` (default 1 GiB): above
  //    it the deciding scan costs a material fraction of what it could
  //    save — ANALYZE or the conf force remain the warehouse-scale
  //    levers;
  //  * the candidate aliases contain a kernel class with measured WIN
  //    potential — by default only the quadratic graft_seq_ratio
  //    kernel; ScalaUDF probing is OPT-IN via `probeUdfs` (see
  //    probeWorthy: default-on UDF probing taxed every ml/multimodal
  //    query, measured +1.7 s on m8_lsa), and the linear regexp/JSON
  //    classes lost at every measured dup factor, so spending a probe
  //    scan on them would be pure overhead — they keep requiring
  //    ANALYZE'd stats.
  // Results are cached per (canonicalized child, key names) so the
  // optimizer's fixpoint re-runs and repeated queries over the same
  // relation don't re-scan.
  private val probing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private val probeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(LogicalPlan, Seq[String]),
        Option[(Double, Seq[(String, Double, Double)])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, Seq[String]),
            Option[(Double, Seq[(String, Double, Double)])]]): Boolean =
        size() > 64
    })

  private def scanShaped(p: LogicalPlan): Boolean = !p.exists {
    case _: Project | _: org.apache.spark.sql.catalyst.plans.logical.Filter
         | _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => false
    case _ => true
  }

  /** ScalaUDF probing is OPT-IN (`spark.graft.dedupCompute.probeUdfs`):
    * spark.ml pipelines and renderer helpers wrap nearly every
    * transform in a UDF over a near-unique key, so default-on UDF
    * probing taxed EVERY ml/multimodal query with a probe scan that
    * always declined (measured +1.7 s on m8_lsa, +1.5 s on
    * mm_audio_features at sf0.1 — r14 bench sweep). The quadratic
    * graft_seq_ratio kernel — the one measured-WIN class — stays
    * probe-worthy by default. */
  private def probeWorthy(aliases: Seq[Alias]): Boolean = {
    val udfsOk = conf.getConfString(
      "spark.graft.dedupCompute.probeUdfs", "false").toBoolean
    aliases.exists(_.child.exists {
      case _: graft.expr.GraftSeqRatio => true
      case _: ScalaUDF => udfsOk
      case _ => false
    })
  }

  private def probeInputs(child: LogicalPlan, refs: AttributeSet,
                          aliases: Seq[Alias])
      : Option[(Double, Double, Map[ExprId, Double])] = {
    val enabled = conf.getConfString(
      "spark.graft.dedupCompute.probe", "true").toBoolean
    val maxBytes = conf.getConfString(
      "spark.graft.dedupCompute.probeMaxBytes", (1L << 30).toString).toLong
    val keys = refs.toSeq.sortBy(_.name)
    if (!enabled || probing.get() || !probeWorthy(aliases) ||
        !scanShaped(child) || keys.map(_.name).distinct.size != keys.size ||
        child.stats.sizeInBytes > maxBytes) return None
    val spark = org.apache.spark.sql.classic.SparkSession.getActiveSession
      .getOrElse(return None)
    val cacheKey = (child.canonicalized, keys.map(_.name))
    val cached = Option(probeCache.get(cacheKey)).getOrElse {
      val computed = try {
        probing.set(java.lang.Boolean.TRUE)
        import org.apache.spark.sql.catalyst.expressions.aggregate._
        def agg(f: AggregateFunction, name: String) =
          Alias(AggregateExpression(f, Complete, isDistinct = false), name)()
        // OctetLength (BYTES), not Length (chars): catalog
        // ColumnStat.avgLen is byte-based, and the kernel coefficients
        // were calibrated against it — a chars-based probe would flip
        // the decision vs the ANALYZE path on multi-byte text
        val aggs = agg(Count(Seq(Literal(1))), "n") +: keys.flatMap { k =>
          Seq(agg(HyperLogLogPlusPlus(k), s"d_${k.name}"),
            agg(Average(Coalesce(Seq(
              Cast(OctetLength(Cast(k, org.apache.spark.sql.types.StringType)),
                org.apache.spark.sql.types.DoubleType),
              Literal(0.0)))), s"l_${k.name}"))
        }
        val row = org.apache.spark.sql.classic.GraftBridge
          .ofRows(spark, Aggregate(Nil, aggs, child)).head()
        val n = row.getLong(0).toDouble
        val perKey = keys.zipWithIndex.map { case (k, i) =>
          (k.name, row.getLong(1 + 2 * i).toDouble,
            Option(row.get(2 + 2 * i)).map(_.toString.toDouble)
              .getOrElse(0.0))
        }
        Some((n, perKey))
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"dedupCompute probe failed (rewrite declines " +
            s"this time; not cached — a transient failure must not " +
            s"disable the gate for the relation's lifetime): $e")
          None
      } finally probing.set(java.lang.Boolean.FALSE)
      // cache successes only: a cached None would silently pin the
      // decline for the whole JVM on a transient failure
      computed.foreach(_ => probeCache.put(cacheKey, computed))
      computed
    }
    cached.map { case (n, perKey) =>
      val byName = perKey.map(p => p._1 -> p).toMap
      val d = math.min(perKey.map(_._2).product, n)
      val avgLen = keys.map(k => k.exprId -> byName(k.name)._3).toMap
      (n, d, avgLen)
    }
  }

  /** The auto-mode decision for one candidate group: do the statistics
    * (catalog stats, else the bounded live probe) prove the kernel
    * savings clear the rewrite's own cost? Unknown inputs decline. */
  private def costJustified(child: LogicalPlan, refs: AttributeSet,
                            aliases: Seq[Alias]): Boolean =
    statsInputs(child, refs).orElse(probeInputs(child, refs, aliases))
      .exists { case (n, d, avgLen) =>
        val groupLen = avgLen.values.sum
        val kernelNs = aliases.map(_.child.collect {
          case e if expensiveNode(e) => nodeCostNs(e, avgLen, groupLen)
        }.sum).sum
        (n - d) * kernelNs > n * ProbeNs + FixedNs
      }

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
    // cheapJson rows) — which is exactly what the auto gate's
    // avgLen-scaled linear cost distinguishes
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
    val m = mode
    if (m != "true" && m != "auto") return plan
    if (probing.get()) return plan // never rewrite our own probe job
    val forced = m == "true"
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
          // one join-back per distinct key set (usually exactly one);
          // in auto mode each group must clear the measured break-even
          val groups = expensive.groupBy(_.references)
            .filter { case (refs, aliases) =>
              forced || costJustified(child, refs, aliases) }
          if (groups.isEmpty) p
          else rewriteGroups(list, child, groups)
        }
    }
  }

  /** The mechanical rewrite once the candidate groups are decided. */
  private def rewriteGroups(list: Seq[NamedExpression],
      child: LogicalPlan,
      groups: Map[AttributeSet, Seq[Alias]]): LogicalPlan = {
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
    val expensiveIds = groups.values.flatten.map(_.exprId).toSet
    val outList = list.map {
      case a: Alias if expensiveIds.contains(a.exprId) => a.toAttribute
      case other => other
    }
    Project(outList, joined)
  }
}
