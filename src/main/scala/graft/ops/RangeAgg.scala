package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Join-free per-interval range aggregation (r16 operator; r17 re-based
  * onto the shared [[graft.plans.RangeAggPrefix]] plan builder — the
  * same machinery the optimizer's aggregate-over-range-join rewrite
  * emits, so the explicit operator and the auto path cannot drift).
  *
  * Why it exists: the band fixture is OUTPUT-BOUND quadratic — every
  * ×10 in rows is ×100 in qualifying (point, interval) pairs
  * (1.86M → 186M → 18.6B at sf0.1/sf1/sf10) — so ANY pair-enumerating
  * plan pays wall time linear in pairs (measured 910–1502 s at ×100).
  * When the question is per-interval COUNT + exact SUM, the prefix form
  * answers in O((n+q) log) at any density (26 s at ×100). Algorithm,
  * exactness (long/decimal-cents accumulation, bit-identical under any
  * partitioning), inclusivity tag order, duplicate-id safety (signed
  * probes), and the loud 2^63 overflow contract are documented on
  * RangeAggPrefix.
  *
  * r17 note: the r16 implementation's localCheckpoint / broadcast-var /
  * persist lifecycle (and its undocumented unique-id requirement) are
  * gone — the plan is now a single declarative pipeline whose physical
  * shape PlanAudit inspects directly, duplicate interval ids aggregate
  * correctly by construction, and the only driver state is one tiny
  * per-partition totals row inside the exec.
  *
  * Aggregate coverage contract (r16 VERDICT #6, extended r18): COUNT
  * and exact SUMS (decimal p ≤ 18 / integral) are prefix-expressible
  * and supported; AVG falls out as exact-sum / count (spec-pinned via
  * the auto rewrite's davg test). MIN/MAX correctly DECLINE the
  * prefix REWRITE (an extremum is not a difference of two prefix
  * values, and the exact NaN contract needs a data probe a logical
  * rewrite cannot run) — but when the aggregated value IS the point
  * expression they are answered join-free by the PREDECESSOR-scan
  * operators [[extremaInRangeAgg]] / [[keyedExtremaInRangeAgg]]
  * (r18, plans/RangeExtrema). Plain DOUBLE sums always decline:
  * float re-association drifts. The family also covers exact
  * DISTINCT-in-range ([[distinctPointsInRangeAgg]]) and
  * interval×interval overlap counting ([[intervalOverlapAgg]]). */
object RangeAgg {

  /** The operators below attach helper columns under the reserved
    * `_gx_` / `_graft_` prefixes (rename-then-join stitches, synthetic
    * instance ids). An input frame already carrying such a name would
    * produce ambiguous-column failures — or, worse, a silently wrong
    * self-equality join when a rename becomes a no-op — so reject it
    * loudly up front (r19, ADVICE item). */
  private def requireClean(df: DataFrame, side: String): Unit = {
    val bad = df.columns.filter(c =>
      c.startsWith("_gx_") || c.startsWith("_graft_"))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"RangeAgg: $side column(s) ${bad.mkString("'", "', '", "'")} use " +
        "the reserved '_gx_'/'_graft_' prefix - rename them before " +
        "calling")
  }

  /** Per-interval (cnt, sum) of `ptCol` values in [loCol, hiCol]
    * (inclusive both ends). Output columns: (idCol — original type
    * preserved, cnt: long, sum: double — exact decimal(18,2) sum).
    * Intervals with zero qualifying points are dropped, matching the
    * join-then-aggregate form this replaces; interval rows sharing an
    * id value aggregate together, exactly as that form would. */
  def pointsInRangeAgg(points: DataFrame, ptCol: String,
                       intervals: DataFrame, idCol: String,
                       loCol: String, hiCol: String): DataFrame = {
    val spark = points.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ptPlan = points.queryExecution.analyzed
    val ivPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, what: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"RangeAgg: no $what column '$n' in ${p.output.map(_.name)}"))
    val pt = attr(ptPlan, ptCol, "point")
    val id = attr(ivPlan, idCol, "interval id")
    val lo = attr(ivPlan, loCol, "interval lo")
    val hi = attr(ivPlan, hiCol, "interval hi")
    val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "cnt")()
    val sum = Alias(Cast(AggregateExpression(
      Sum(Cast(pt, DecimalType(18, 2))), Complete, isDistinct = false),
      DoubleType), "sum")()
    val plan = graft.plans.RangeAggPrefix.tryBuild(
      Seq(id), Seq(id, cnt, sum), pt, lo, hi,
      loStrict = false, hiStrict = false, ptPlan, ivPlan)
      .getOrElse(throw new IllegalArgumentException(
        s"RangeAgg: '$ptCol'/'$loCol'/'$hiCol' must be numeric types " +
          "whose double image is order-exact (double/float/int or " +
          s"narrower); got ${pt.dataType}/${lo.dataType}/${hi.dataType}"))
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark, plan)
  }

  /** Exact per-interval-key (min_v, max_v) of `ptCol` values in
    * [loCol, hiCol] (inclusive both ends), JOIN-FREE (r18 — the r17
    * VERDICT's "ship it or refute" item). The prefix rewrite correctly
    * declines extrema (a per-interval max is not a difference of two
    * prefixes), but when the aggregated value IS the point expression
    * the answer degenerates to a PREDECESSOR query over the same
    * value-ordered stream: max{pt ∈ [lo, hi]} = last point ≤ hi
    * (valid iff ≥ lo), min by negation — see
    * [[graft.plans.RangeExtrema]]. Two range exchanges (one per
    * extreme), two linear scans each, driver state = partitions ×
    * (bool, double); no pair ever materialized, cost independent of
    * band density. Duplicate key values aggregate together exactly as
    * min/max-over-join would (extrema are union-compatible — the SQL
    * group extreme over duplicate-key instances is the extreme over
    * the union of their point sets). Keys with zero qualifying points
    * drop (inner semantics).
    *
    * NaN handling matches the join form under Spark's total order: a
    * NaN point qualifies exactly when hi is NaN; such groups have
    * max = NaN (NaN is SQL-max-greatest) and min = NaN only when no
    * finite point qualifies. The finite extremes come from the scan
    * plans; the NaN-qualifying groups are re-attached here from two
    * tiny aggregates (intervals with NaN hi × whether any NaN point
    * exists). Zero signs are normalized (−0.0 in, +0.0 out — SQL
    * equality treats them as the same value).
    *
    * Output: (idCol — original type preserved, min_v: double,
    * max_v: double). */
  def extremaInRangeAgg(points: DataFrame, ptCol: String,
                        intervals: DataFrame, idCol: String,
                        loCol: String, hiCol: String): DataFrame =
    extremaImpl(points, ptCol, intervals, idCol, loCol, hiCol, None)

  /** Shared implementation of the (keyed) extrema operators: builds
    * the two predecessor-scan plans, stitches them 1:1 (identical
    * membership: keys with ≥1 FINITE qualifying point), and
    * re-attaches the NaN-qualifying groups.
    *
    * NaN branch, both forms: a NaN point satisfies pt >= lo for any
    * lo and pt <= hi exactly when hi is NaN (Spark total order) and —
    * keyed — when its key matches; intervals with a NULL lo never
    * match anything (pt >= NULL is NULL — the r18 review's finding),
    * so they are excluded from the NaN-hi set. TYPE-GATED: only
    * floating pt/hi types can hold NaN. Existence is settled
    * CHEAP-SIDE-FIRST: one bounded probe over the already-filtered
    * NaN-hi interval set (tiny; empty in the overwhelmingly common
    * case, skipping everything), then — unkeyed — one bounded probe
    * over the points (limit(1): early-exits on the first NaN) or —
    * keyed — an in-plan LEFT SEMI hash join of the NaN-hi intervals
    * against the NaN points' keys (a scalar join would plan a nested
    * loop, which the plan gates forbid).
    *
    * STATIC-SOURCE ASSUMPTION (r19, ADVICE item): those two driver-side
    * existence probes run ONCE, at operator-build time, and their
    * verdict is baked into the returned plan. If the underlying source
    * mutates between build and (re-)execution — e.g. parquet files
    * appended under the same path — the finite scans re-read the new
    * data but the NaN re-attach decision does not, and the result can
    * silently diverge from the join form. This is the standard Spark
    * source-snapshot contract (cached plans, checkpoints and AQE
    * broadcasts make the same assumption), and the alternative — an
    * always-on in-plan existence subquery — would charge every
    * caller a full extra scan of the points for a probe that
    * early-exits on the first NaN today. Rebuild the operator after a
    * source mutation. */
  private def extremaImpl(points: DataFrame, ptCol: String,
                          intervals: DataFrame, idCol: String,
                          loCol: String, hiCol: String,
                          keyCols: Option[(String, String)]): DataFrame = {
    requireClean(points, "point")
    requireClean(intervals, "interval")
    val spark = points.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ptPlan = points.queryExecution.analyzed
    val ivPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, what: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"RangeAgg: no $what column '$n' in ${p.output.map(_.name)}"))
    val pt = attr(ptPlan, ptCol, "point")
    val id = attr(ivPlan, idCol, "interval id")
    val lo = attr(ivPlan, loCol, "interval lo")
    val hi = attr(ivPlan, hiCol, "interval hi")
    val equiKeys = keyCols.toSeq.map { case (pkc, ikc) =>
      (attr(ptPlan, pkc, "point key"): org.apache.spark.sql.catalyst
        .expressions.Expression,
        attr(ivPlan, ikc, "interval key"): org.apache.spark.sql.catalyst
        .expressions.Expression)
    }
    def build(neg: Boolean, name: String): DataFrame =
      org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
        graft.plans.RangeExtrema.tryBuildSingle(Seq(id), pt, lo, hi,
          neg, ptPlan, ivPlan, name, equiKeys)
          .getOrElse(throw new IllegalArgumentException(
            s"RangeAgg: '$ptCol'/'$loCol'/'$hiCol' must be order-exact " +
              "numeric (double/float/int or narrower)" +
              keyCols.map { case (pkc, ikc) =>
                s" and '$pkc'/'$ikc' sort-exact equal types" }
                .getOrElse("") +
              s"; got ${pt.dataType}/${lo.dataType}/${hi.dataType}")))
    val maxDf = build(neg = false, "max_v")
    val minDf = build(neg = true, "min_v").withColumnRenamed(idCol, "_gx_id")
    // identical membership (both = keys with ≥1 FINITE qualifying
    // point), so this is a 1:1 stitch of two q-row aggregates
    val finite = maxDf.join(minDf, col(idCol) <=> col("_gx_id"))
      .select(col(idCol), col("min_v"), col("max_v"))
    def floating(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == DoubleType || dt == org.apache.spark.sql.types.FloatType
    if (!(floating(pt.dataType) && floating(hi.dataType))) return finite
    // NaN-hi intervals that can match at all: lo must be non-null
    // (and, keyed, the key non-null — SQL `=` never matches null)
    val nanHi = intervals.filter(isnan(col(hiCol).cast("double")) &&
      col(loCol).isNotNull &&
      keyCols.map(k => col(k._2).isNotNull).getOrElse(lit(true)))
    // cheap side first: no NaN-hi interval ⇒ no NaN membership, skip
    // the points scan entirely
    if (nanHi.limit(1).count() == 0) return finite
    val nanKeys = (keyCols match {
      case None =>
        if (points.filter(isnan(col(ptCol).cast("double")))
            .limit(1).count() == 0) return finite
        nanHi.select(col(idCol)).distinct()
      case Some((pkc, _)) =>
        nanHi.join(points.filter(isnan(col(ptCol).cast("double")))
            .select(col(pkc).as("_gx_pk")),
          col(keyCols.get._2) === col("_gx_pk"), "left_semi")
          .select(col(idCol)).distinct()
    }).select(col(idCol), lit(Double.NaN).as("_gx_nan"))
      .withColumnRenamed(idCol, "_gx_id")
    finite.join(nanKeys, col(idCol) <=> col("_gx_id"), "full")
      .select(coalesce(col(idCol), col("_gx_id")).as(idCol),
        // min: the finite minimum when any finite point qualifies,
        // else NaN (the group is then NaN-only); max: NaN dominates
        coalesce(col("min_v"), col("_gx_nan")).as("min_v"),
        when(col("_gx_nan").isNotNull, Double.NaN)
          .otherwise(col("max_v")).as("max_v"))
  }

  /** Exact per-A-interval count of OVERLAPPING B intervals, join-free
    * (r18 — the interval×interval sibling of the point-in-interval
    * family). Overlap is the raw inclusive predicate
    * `a.lo <= b.hi AND b.lo <= a.hi` over VALID intervals (rows with
    * lo > hi on either side are dropped up front — for valid rows the
    * two failure modes "b entirely below a" and "b entirely above a"
    * are mutually exclusive, so inclusion-exclusion needs no cross
    * term and the count decomposes into two one-sided PREFIX counts:
    *
    *   overlap(a) = N_B − |{b.hi < a.lo}| − |{b.lo > a.hi}|
    *
    * Each term is a [[graft.plans.RangeAggPrefix]] count with one
    * unbounded end — [−∞, a.lo) over the b.hi values and (a.hi, NaN]
    * over the b.lo values (NaN as the upper literal because Spark's
    * total order puts NaN above +∞, so an inclusive NaN probe counts
    * NaN b.lo rows, which the raw predicate correctly rejects as
    * non-overlapping: NaN <= a.hi is false). Every pair-enumerating
    * plan pays the output bill (overlap joins are the j7 story
    * squared — wide windows overlap nearly everything); this runs two
    * range exchanges + a per-id stitch of three tiny aggregates.
    * Duplicate A ids sum their instances' counts, exactly as the
    * join-then-count form does; ids with zero total overlap drop
    * (inner semantics). Output: (idCol, overlap_cnt: long). */
  def intervalOverlapAgg(left: DataFrame, idCol: String,
                         loCol: String, hiCol: String,
                         right: DataFrame,
                         loCol2: String, hiCol2: String): DataFrame =
    overlapImpl(left, idCol, loCol, hiCol, right, loCol2, hiCol2, None)

  /** KEYED exact per-interval overlap count: per A id, how many B
    * intervals with `keyCol2 = keyCol` overlap each A instance —
    * "per user, how many of THEIR reservations overlap each of THEIR
    * windows" (r19, the real-world shape of the overlap query, by the
    * same argument that motivated the keyed band prefix). The
    * decomposition is unchanged; each one-sided frame becomes a KEYED
    * prefix (the equi key leads the range sort — machinery the keyed
    * band already built) and the N_B term becomes a third keyed frame
    * counting every same-key b row. Null keys never match (SQL `=`):
    * null-key A instances contribute zero pairs, null-key B rows count
    * for nobody. Output: (idCol, overlap_cnt: long). */
  def keyedIntervalOverlapAgg(left: DataFrame, idCol: String,
                              keyCol: String,
                              loCol: String, hiCol: String,
                              right: DataFrame, keyCol2: String,
                              loCol2: String, hiCol2: String): DataFrame =
    overlapImpl(left, idCol, loCol, hiCol, right, loCol2, hiCol2,
      Some((keyCol, keyCol2)))

  /** Shared implementation of the (keyed) overlap-count operators.
    * Fully lazy/in-plan (r19): THREE one-sided prefix frames — total
    * ([−∞, NaN] covers every valid b under the total order), below,
    * above — so re-execution re-reads the sources consistently (no
    * baked-in driver count) and no scalar/count join exists anywhere
    * in the plan. */
  private def overlapImpl(left: DataFrame, idCol: String,
                          loCol: String, hiCol: String,
                          right: DataFrame,
                          loCol2: String, hiCol2: String,
                          keyCols: Option[(String, String)]): DataFrame = {
    requireClean(left, "left interval")
    requireClean(right, "right interval")
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val a = left.filter(col(loCol) <= col(hiCol) &&
      keyCols.map(k => col(k._1).isNotNull).getOrElse(lit(true)))
    val b = right.filter(col(loCol2) <= col(hiCol2) &&
        keyCols.map(k => col(k._2).isNotNull).getOrElse(lit(true)))
      .select(keyCols.toSeq.map(k => col(k._2)) ++
        Seq(col(loCol2), col(hiCol2)): _*)
    val aPlan = a.queryExecution.analyzed
    val bPlan = b.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"RangeAgg: no column '$n' in ${p.output.map(_.name)}"))
    val id = attr(aPlan, idCol)
    val alo = attr(aPlan, loCol)
    val ahi = attr(aPlan, hiCol)
    val blo = attr(bPlan, loCol2)
    val bhi = attr(bPlan, hiCol2)
    val equiKeys: Seq[(org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression)] =
      keyCols.toSeq.map { case (ak, bk) => (attr(bPlan, bk), attr(aPlan, ak)) }
    def oneSided(pt: Attribute, lo: org.apache.spark.sql.catalyst.expressions.Expression,
                 hi: org.apache.spark.sql.catalyst.expressions.Expression,
                 loStrict: Boolean, hiStrict: Boolean,
                 name: String): DataFrame = {
      val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
        isDistinct = false), name)()
      val plan = graft.plans.RangeAggPrefix.tryBuild(
        Seq(id), Seq(id, cnt), pt, lo, hi, loStrict, hiStrict,
        bPlan, aPlan, equiKeys)
        .getOrElse(throw new IllegalArgumentException(
          s"RangeAgg: '$loCol'/'$hiCol'/'$loCol2'/'$hiCol2' must be " +
            "numeric types whose double image is order-exact " +
            "(double/float/int or narrower)" +
            keyCols.map { case (ak, bk) =>
              s" and '$ak'/'$bk' sort-exact equal types" }.getOrElse("")))
      org.apache.spark.sql.classic.GraftBridge.ofRows(spark, plan)
    }
    // |{b.hi < a.lo}|: b.hi values in [−∞, a.lo)
    val below = oneSided(bhi, Literal(Double.NegativeInfinity), alo,
        loStrict = false, hiStrict = true, "below")
      .withColumnRenamed(idCol, "_gx_idb")
    // |{b.lo > a.hi}|: b.lo values in (a.hi, NaN] (NaN as the upper
    // literal: Spark's total order puts NaN above +∞, so NaN b.lo rows
    // land in "above" — the raw predicate rejects them as
    // non-overlapping)
    val above = oneSided(blo, ahi, Literal(Double.NaN),
        loStrict = true, hiStrict = false, "above")
      .withColumnRenamed(idCol, "_gx_ida")
    // the N_B term is ITSELF a one-sided prefix frame (r19): count of
    // b.hi values in [−∞, NaN] inclusive — under the total order that
    // is EVERY valid b row (keyed: every same-key one), summed over
    // the id's instances, exactly Σ_instances N_B(k_i). Three uniform
    // frames, no scalar/count join anywhere (a constant-key join of
    // the global count constant-folds into a nested loop, which the
    // plan gates forbid — and per-key counts would add a second join
    // shape; the frame form is one machine for both)
    val total = oneSided(bhi, Literal(Double.NegativeInfinity),
      Literal(Double.NaN), loStrict = false, hiStrict = false, "_gx_nb")
    total
      .join(below, col(idCol) <=> col("_gx_idb"), "left")
      .join(above, col(idCol) <=> col("_gx_ida"), "left")
      .select(col(idCol),
        (col("_gx_nb") - coalesce(col("below"), lit(0L)) -
          coalesce(col("above"), lit(0L))).as("overlap_cnt"))
      .filter(col("overlap_cnt") > 0)
  }

  /** Exact per-A-interval TOTAL OVERLAP LENGTH with the B intervals —
    * `sum(greatest(0, least(a.hi, b.hi) − greatest(a.lo, b.lo)))` per
    * A id — join-free (r18, the scheduling/telemetry "how much of each
    * maintenance window is covered by reservations" query). Per
    * instance [L, H] over valid B:
    *
    *   len = (Σ{b.hi ∈ [L,H]} + H·|{b ∈ O, b.hi > H}|)
    *       − (Σ{b.lo ∈ [L,H]} + L·|{b ∈ O, b.lo < L}|)
    *
    * where |{b∈O, b.hi > H}| = |{b.lo ≤ H}| − |{b.hi ≤ H}| and
    * |{b∈O, b.lo < L}| = |{b.lo < L}| − |{b.hi < L}| (valid intervals
    * make the inclusions exact) — and the two-sided terms decompose the
    * same way (r20): Σ{b.hi ∈ [L,H]} = Σ{b.hi ≤ H} − Σ{b.hi < L} and
    * Σ{b.lo ∈ [L,H]} = Σ{b.lo ≤ H} − Σ{b.lo < L}, exact because every
    * term is a decimal-cents sum. So FOUR one-sided prefix frames over
    * the two endpoint value sets — (b.lo ≤ H), (b.hi ≤ H), (b.lo < L),
    * (b.hi < L), each carrying count AND cents-sum — answer everything
    * the r18/r19 six-frame form (two extra two-sided frames) computed:
    * two fewer range exchanges, scans and stitch joins for the same
    * bit-exact output. Every frame is a [[graft.plans
    * .RangeAggPrefix]] plan. Because the H·count / L·count products
    * must pair each INSTANCE's own bound with its own counts,
    * duplicate A ids get a synthetic instance id first — r19: a
    * CONTENT-DERIVED one, `row_number() OVER (PARTITION BY id ORDER BY
    * lo, hi)`, so every one of the four branches (and the join spine)
    * derives the identical id↔(lo, hi) mapping independently, with no
    * eager materialization: rows tied on the full ordering are
    * column-identical, hence interchangeable, so any tie-break yields
    * the same multiset of instances. (The r18 form used
    * monotonically_increasing_id + localCheckpoint(eager) — layout-
    * dependent ids held consistent by materializing the A side, an
    * unbounded executor-storage bill at 100 TB with a large interval
    * table. The window is one hash exchange on id instead; a single
    * id with millions of duplicate instances would serialize in one
    * task, the usual window-skew contract.) Per-id results then sum
    * the instances, exactly like the join form. Sums are exact:
    * endpoint values accumulate as decimal(18,2) cents inside the
    * prefix plans and the bound×count products stay in decimal —
    * bit-stable under any partitioning.
    *
    * CONTRACT: finite intervals only — rows with NaN or ±∞ bounds on
    * EITHER side are excluded up front (length arithmetic is undefined
    * there; the oracle applies the same filter), as are inverted rows.
    * A ids whose instances overlap nothing drop (inner semantics);
    * touching intervals count with length 0. Output:
    * (idCol, overlap_len: double). */
  def intervalOverlapLenAgg(left: DataFrame, idCol: String,
                            loCol: String, hiCol: String,
                            right: DataFrame,
                            loCol2: String, hiCol2: String): DataFrame =
    overlapLenImpl(left, idCol, loCol, hiCol, right, loCol2, hiCol2, None)

  /** KEYED overlap LENGTH (r19): total overlap duration per A id over
    * B intervals of the SAME key — `sum(least(a.hi, b.hi) −
    * greatest(a.lo, b.lo))` over same-key overlapping pairs. Same four
    * frames, each a KEYED prefix (the equi key leads every range
    * sort); null keys never match. Output: (idCol, overlap_len). */
  def keyedIntervalOverlapLenAgg(left: DataFrame, idCol: String,
                                 keyCol: String,
                                 loCol: String, hiCol: String,
                                 right: DataFrame, keyCol2: String,
                                 loCol2: String, hiCol2: String): DataFrame =
    overlapLenImpl(left, idCol, loCol, hiCol, right, loCol2, hiCol2,
      Some((keyCol, keyCol2)))

  private def overlapLenImpl(left: DataFrame, idCol: String,
                             loCol: String, hiCol: String,
                             right: DataFrame,
                             loCol2: String, hiCol2: String,
                             keyCols: Option[(String, String)]): DataFrame = {
    requireClean(left, "left interval")
    requireClean(right, "right interval")
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    def finite(c: String) = col(c).cast("double") >
      lit(Double.NegativeInfinity) &&
      col(c).cast("double") < lit(Double.PositiveInfinity)
    // content-derived instance identity (see scaladoc): tied rows are
    // column-identical under this ordering, so the assignment is a
    // deterministic function of content — every branch re-derives it
    val ord = keyCols.toSeq.map(k => col(k._1)) ++
      Seq(col(loCol), col(hiCol))
    val a0 = left.filter(col(loCol) <= col(hiCol) &&
        finite(loCol) && finite(hiCol))
      // grouping by the key itself (keyCol == idCol) must not select
      // the column twice — the duplicate name would break the window
      .select(Seq(col(idCol)) ++ keyCols.toSeq.filter(_._1 != idCol)
        .map(k => col(k._1)) ++
        Seq(col(loCol), col(hiCol)): _*)
      .withColumn("_gx_iid", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(ord: _*)))
    val b0 = right.filter(col(loCol2) <= col(hiCol2) &&
        finite(loCol2) && finite(hiCol2))
      .select(keyCols.toSeq.map(k => col(k._2)) ++
        Seq(col(loCol2), col(hiCol2)): _*)
    val aPlan = a0.queryExecution.analyzed
    val bPlan = b0.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"RangeAgg: no column '$n' in ${p.output.map(_.name)}"))
    val id = attr(aPlan, idCol)
    val iid = attr(aPlan, "_gx_iid")
    val alo = attr(aPlan, loCol)
    val ahi = attr(aPlan, hiCol)
    val blo = attr(bPlan, loCol2)
    val bhi = attr(bPlan, hiCol2)
    val equiKeys: Seq[(org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression)] =
      keyCols.toSeq.map { case (ak, bk) => (attr(bPlan, bk), attr(aPlan, ak)) }
    import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr}
    def frame(pt: Attribute, lo: CExpr, hi: CExpr, hiStrict: Boolean,
              wantSum: Boolean, cntName: String, sumName: String)
        : DataFrame = {
      val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))),
        Complete, isDistinct = false), cntName)()
      val aggs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression] =
        if (!wantSum) Seq(id, iid, cnt)
        else Seq(id, iid, cnt, Alias(AggregateExpression(
          Sum(Cast(pt, DecimalType(18, 2))), Complete,
          isDistinct = false), sumName)())
      val plan = graft.plans.RangeAggPrefix.tryBuild(
        Seq(id, iid), aggs, pt, lo, hi, loStrict = false,
        hiStrict = hiStrict, bPlan, aPlan, equiKeys)
        .getOrElse(throw new IllegalArgumentException(
          s"RangeAgg: '$loCol'/'$hiCol'/'$loCol2'/'$hiCol2' must be " +
            "numeric types whose double image is order-exact " +
            "(double/float/int or narrower)" +
            keyCols.map { case (ak, bk) =>
              s" and '$ak'/'$bk' sort-exact equal types" }.getOrElse("")))
      org.apache.spark.sql.classic.GraftBridge.ofRows(spark, plan)
    }
    val negInf = Literal(Double.NegativeInfinity)
    def ren(df: DataFrame, tag: String): DataFrame =
      df.withColumnRenamed(idCol, s"_gx_id_$tag")
        .withColumnRenamed("_gx_iid", s"_gx_iid_$tag")
    // four one-sided frames, each count + cents-sum (see scaladoc): the
    // r18/r19 two-sided [L, H] frames are exact decimal differences of
    // these — Σ/|{b.hi ∈ [L,H]}| = (b.hi ≤ H) − (b.hi < L), same for b.lo
    val f3 = ren(frame(blo, negInf, ahi, hiStrict = false,
      wantSum = true, "c3", "s3"), "3") // b.lo <= H
    val f4 = ren(frame(bhi, negInf, ahi, hiStrict = false,
      wantSum = true, "c4", "s4"), "4") // b.hi <= H
    val f5 = ren(frame(blo, negInf, alo, hiStrict = true,
      wantSum = true, "c5", "s5"), "5") // b.lo < L
    val f6 = ren(frame(bhi, negInf, alo, hiStrict = true,
      wantSum = true, "c6", "s6"), "6") // b.hi < L
    def j(acc: DataFrame, f: DataFrame, tag: String): DataFrame =
      acc.join(f, col(idCol) <=> col(s"_gx_id_$tag") &&
          col("_gx_iid") === col(s"_gx_iid_$tag"), "left")
        .drop(s"_gx_id_$tag").drop(s"_gx_iid_$tag")
    val joined = Seq(("3", f3), ("4", f4),
      ("5", f5), ("6", f6)).foldLeft(a0) { case (acc, (tag, f)) =>
      j(acc, f, tag)
    }
    def cnt(n: String) = coalesce(col(n), lit(0L))
    def cents(n: String) =
      coalesce(col(n), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
    val dec = "decimal(18,2)"
    joined
      .withColumn("_gx_pairs", cnt("c3") - cnt("c6")) // N-below-above
      .withColumn("_gx_len",
        ((cents("s4") - cents("s6")) +
          col(hiCol).cast(dec) * (cnt("c3") - cnt("c4"))) -
        ((cents("s3") - cents("s5")) +
          col(loCol).cast(dec) * (cnt("c5") - cnt("c6"))))
      .groupBy(col(idCol))
      .agg(sum(col("_gx_pairs")).as("_gx_tp"),
        sum(col("_gx_len")).cast("double").as("overlap_len"))
      .filter(col("_gx_tp") > 0)
      .select(col(idCol), col("overlap_len"))
  }

  /** KEYED exact per-interval (min_v, max_v): extrema of `ptCol` over
    * points whose `ptKeyCol` equals the interval's `ivKeyCol` AND whose
    * value lies in [loCol, hiCol] — "largest/smallest event value in
    * each session's window, per user", join-free (r18). The stream
    * sorts by (key, v, tag) and the predecessor scan carries the last
    * point's key: the predecessor is valid exactly when that key
    * equals the probe's (the last point before a probe has key ≤ the
    * probe's key, equal iff same run — no reset machinery needed).
    * Null keys never match (SQL `=`); NaN keys match each other
    * (bit-image compare in the exec, matching Spark's `=`); the
    * NaN-POINT branch is a per-key semi join here (fully in-plan — a
    * NaN point qualifies an interval iff the keys match and hi is
    * NaN), no driver probe needed. Groups are per `idCol` (duplicate
    * ids exact — extrema are union-compatible); keys with zero
    * qualifying points drop. Output: (idCol, min_v, max_v). */
  def keyedExtremaInRangeAgg(points: DataFrame, ptCol: String,
                             ptKeyCol: String,
                             intervals: DataFrame, idCol: String,
                             ivKeyCol: String,
                             loCol: String, hiCol: String): DataFrame =
    extremaImpl(points, ptCol, intervals, idCol, loCol, hiCol,
      Some((ptKeyCol, ivKeyCol)))

  /** Exact per-interval-key (min_f, max_f) of an ARBITRARY point-side
    * column `fCol` over points with `ptCol ∈ [loCol, hiCol]`
    * (inclusive), JOIN-FREE (r19 — the decline RangeExtrema documented,
    * shipped: "largest transfer size among events in each window").
    * `max(f)` over the membership is not a predecessor query — it is a
    * RANGE-MAXIMUM over the value-sorted point run — so the plan is
    * the [[graft.plans.RangeValueExtrema]] scan: ONE range exchange of
    * points + two probes per interval, each partition answering its
    * probes' [lo, hi] queries from a local segment tree, partitions
    * fully inside a band covered by a per-partition stats table
    * (driver state: partitions × 6 values). min and max come from the
    * SAME scan (idempotent combines need no negation trick), so this
    * is one exchange where the pt-extrema operator needs two. No pair
    * is ever materialized; cost is independent of band density.
    *
    * CONTRACT: rows with null `ptCol` or null `fCol` are excluded —
    * membership is "qualifying point with non-null f", i.e. the join
    * form `JOIN ON pt BETWEEN lo AND hi WHERE f IS NOT NULL` (SQL's
    * min/max skip nulls anyway; the filter only changes which GROUPS
    * exist, and this operator's groups are those with ≥1 non-null-f
    * qualifying point). NaN points qualify exactly when hi is NaN
    * (Spark total order) and are re-attached from two tiny aggregates
    * exactly like [[extremaInRangeAgg]] — same static-source
    * assumption (see [[extremaImpl]]). NaN `f` values participate
    * normally (max of a set containing NaN is NaN; min prefers finite
    * — both engines' total order). Duplicate interval keys are exact
    * for free (extrema are union-compatible); keys with zero
    * qualifying points drop. LongType pt/f decline (order-exactness of
    * the double image); cast to int/double when the domain allows.
    *
    * Output: (idCol, min_f: double, max_f: double). */
  def valueExtremaInRangeAgg(points: DataFrame, ptCol: String,
                             fCol: String,
                             intervals: DataFrame, idCol: String,
                             loCol: String, hiCol: String): DataFrame =
    valueExtremaImpl(points, ptCol, fCol, intervals, idCol, loCol,
      hiCol, None)

  /** KEYED value extrema (r19): (min_f, max_f) of `fCol` over points
    * whose `ptKeyCol` equals the interval's `ivKeyCol` AND whose
    * `ptCol` lies in [loCol, hiCol] — "largest transfer size among
    * THEIR events in each user's window", the full combination of the
    * keyed band and the arbitrary-column extrema. Same single
    * [[graft.plans.RangeValueExtrema]] scan: the equi key leads the
    * range sort and every position is read in the COMPOSITE (key, v)
    * order, under which the unkeyed coverage argument holds verbatim
    * (a partition fully inside [(k, lo), (k, hi)] is necessarily
    * pure-key and its whole-partition f extrema apply — no per-key
    * partition statistics needed). Null keys never match; NaN keys
    * match each other; the NaN-point branch becomes a per-key
    * aggregate joined through the interval keys. Output:
    * (idCol, min_f, max_f). */
  def keyedValueExtremaInRangeAgg(points: DataFrame, ptCol: String,
                                  fCol: String, ptKeyCol: String,
                                  intervals: DataFrame, idCol: String,
                                  ivKeyCol: String,
                                  loCol: String, hiCol: String): DataFrame =
    valueExtremaImpl(points, ptCol, fCol, intervals, idCol, loCol,
      hiCol, Some((ptKeyCol, ivKeyCol)))

  private def valueExtremaImpl(points: DataFrame, ptCol: String,
                               fCol: String,
                               intervals: DataFrame, idCol: String,
                               loCol: String, hiCol: String,
                               keyCols: Option[(String, String)])
      : DataFrame = {
    requireClean(points, "point")
    requireClean(intervals, "interval")
    val spark = points.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ptPlan = points.queryExecution.analyzed
    val ivPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, what: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"RangeAgg: no $what column '$n' in ${p.output.map(_.name)}"))
    val pt = attr(ptPlan, ptCol, "point")
    val fv = attr(ptPlan, fCol, "point value")
    val id = attr(ivPlan, idCol, "interval id")
    val lo = attr(ivPlan, loCol, "interval lo")
    val hi = attr(ivPlan, hiCol, "interval hi")
    val equiKeys = keyCols.toSeq.map { case (pkc, ikc) =>
      (attr(ptPlan, pkc, "point key"): org.apache.spark.sql.catalyst
        .expressions.Expression,
        attr(ivPlan, ikc, "interval key"): org.apache.spark.sql.catalyst
        .expressions.Expression)
    }
    val finite = org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
      graft.plans.RangeValueExtrema.tryBuild(Seq(id), pt, fv, lo, hi,
        ptPlan, ivPlan, equiKeys)
        .getOrElse(throw new IllegalArgumentException(
          s"RangeAgg: '$ptCol'/'$fCol'/'$loCol'/'$hiCol' must be " +
            "numeric types whose double image is order-exact " +
            "(double/float/int or narrower)" +
            keyCols.map { case (pkc, ikc) =>
              s" and '$pkc'/'$ikc' sort-exact equal types" }
              .getOrElse("") +
            s"; got ${pt.dataType}/${fv.dataType}/${lo.dataType}/" +
            s"${hi.dataType}")))
    def floating(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == DoubleType || dt == org.apache.spark.sql.types.FloatType
    if (!(floating(pt.dataType) && floating(hi.dataType))) return finite
    // NaN-point branch (type-gated; static-source assumption as in
    // extremaImpl): a NaN point qualifies an interval iff hi is NaN,
    // lo is non-null and — keyed — the keys match; those groups union
    // the (per-key) NaN points' f extrema into their finite answer
    val nanHi = intervals.filter(isnan(col(hiCol).cast("double")) &&
      col(loCol).isNotNull &&
      keyCols.map(k => col(k._2).isNotNull).getOrElse(lit(true)))
    if (nanHi.limit(1).count() == 0) return finite
    val nanPts = points.filter(isnan(col(ptCol).cast("double")) &&
      col(fCol).isNotNull &&
      keyCols.map(k => col(k._1).isNotNull).getOrElse(lit(true)))
    if (nanPts.limit(1).count() == 0) return finite
    // −0.0 f normalizes to +0.0 (the finite path's dbl image does the
    // same); min/max over NaN f follow the engines' shared total order
    val attach = (keyCols match {
      case None =>
        val nf = nanPts.agg(
            min(col(fCol).cast("double") + lit(0.0)).as("_gx_nmin"),
            max(col(fCol).cast("double") + lit(0.0)).as("_gx_nmax"))
          .withColumn("_gx_j", lit(1))
        nanHi.select(col(idCol)).distinct()
          .withColumn("_gx_j", lit(1)).join(broadcast(nf), Seq("_gx_j"))
          .drop("_gx_j")
      case Some((pkc, ikc)) =>
        // per-key NaN extrema, joined through the interval keys and
        // re-grouped per id (an id may hold instances of several
        // keys). The key is aliased so idCol == ivKeyCol — grouping
        // by the key itself — cannot produce a duplicate column name.
        val nf = nanPts.groupBy(col(pkc).as("_gx_nk"))
          .agg(min(col(fCol).cast("double") + lit(0.0)).as("_gx_kmin"),
            max(col(fCol).cast("double") + lit(0.0)).as("_gx_kmax"))
        nanHi.select(col(idCol), col(ikc).as("_gx_ik")).distinct()
          .join(nf, col("_gx_ik") === col("_gx_nk"))
          .groupBy(col(idCol))
          .agg(min(col("_gx_kmin")).as("_gx_nmin"),
            max(col("_gx_kmax")).as("_gx_nmax"))
    }).withColumnRenamed(idCol, "_gx_id")
    // least/greatest skip nulls and use the NaN-greatest total order —
    // exactly min/max-over-the-union semantics for the stitch
    finite.join(attach, col(idCol) <=> col("_gx_id"), "full")
      .select(coalesce(col(idCol), col("_gx_id")).as(idCol),
        least(col("min_f"), col("_gx_nmin")).as("min_f"),
        greatest(col("max_f"), col("_gx_nmax")).as("max_f"))
  }

  /** Exact per-interval-KEY count of DISTINCT `ptCol` values in the
    * UNION of that key's [loCol, hiCol] intervals (inclusive) — the
    * aggregate the prefix REWRITE must decline (count(DISTINCT) over a
    * band join unions values across duplicate-key instances, which is
    * not a sum of per-instance prefix differences). This operator makes
    * it exact by construction, join-free:
    *
    *  1. intervals MERGE per key (sort by lo, running-max hi, the
    *     classic island pattern — a window over each key's handful of
    *     rows, one exchange on the key): the union of a key's bands
    *     becomes disjoint segments, so distinct counts ADD across them;
    *  2. points DEDUPE by value (one exchange);
    *  3. the shared RangeAggPrefix plan counts deduped points per
    *     segment and sums segments per key.
    *
    * Touching segments ([1,2] + [2,3]) merge — a value at the shared
    * endpoint is in both bands and must count once. Inverted/null
    * bands drop, keys with zero qualifying values drop — matching
    * count-distinct-over-inner-join. Output: (idCol, distinct_cnt). */
  def distinctPointsInRangeAgg(points: DataFrame, ptCol: String,
                               intervals: DataFrame, idCol: String,
                               loCol: String, hiCol: String): DataFrame = {
    requireClean(points, "point")
    requireClean(intervals, "interval")
    val spark = points.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val byId = Window.partitionBy(idCol).orderBy(col(loCol))
    val prevMax = max(col(hiCol)).over(
      byId.rowsBetween(Window.unboundedPreceding, -1))
    val merged = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_graft_new_seg",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_graft_seg", sum(col("_graft_new_seg")).over(byId))
      .groupBy(col(idCol), col("_graft_seg"))
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol))
      .select(col(idCol), col(loCol), col(hiCol))
    val deduped = points.select(col(ptCol)).distinct()
    val ptPlan = deduped.queryExecution.analyzed
    val ivPlan = merged.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).get
    val pt = attr(ptPlan, ptCol)
    val id = attr(ivPlan, idCol)
    val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "distinct_cnt")()
    val plan = graft.plans.RangeAggPrefix.tryBuild(
      Seq(id), Seq(id, cnt), pt, attr(ivPlan, loCol), attr(ivPlan, hiCol),
      loStrict = false, hiStrict = false, ptPlan, ivPlan)
      .getOrElse(throw new IllegalArgumentException(
        s"RangeAgg: '$ptCol'/'$loCol'/'$hiCol' must be numeric types " +
          "whose double image is order-exact (double/float/int or " +
          "narrower)"))
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark, plan)
  }
}
