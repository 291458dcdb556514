package graft.ml

/** M4 knee/elbow detection — the Kneedle algorithm (Satopää et al. 2011,
  * "Finding a 'Kneedle' in a Haystack"), as the reference uses it to pick
  * DBSCAN ε from the sorted kNN-distance curve
  * (`epsilon_search`, word2vec_dbscan_approach.ipynb:191-198: ε =
  * max(all_elbows) of KneeLocator(curve, convex/increasing)).
  *
  * Driver-side by design: the input is the collected distance curve (n
  * points after aggregation — thousands, not billions), the same boundary
  * the reference draws.
  */
object Kneedle {

  /** All elbow x-indices of an increasing convex curve `y` (the sorted
    * distance curve), with sensitivity S (reference sweeps S∈{1,…,200},
    * default 1). Returns indices into `y`; empty if no knee. */
  def elbows(y: Array[Double], sensitivity: Double = 1.0): Seq[Int] = {
    val n = y.length
    if (n < 3) return Seq.empty
    // 1. normalize to unit square
    val x = Array.tabulate(n)(_.toDouble / (n - 1))
    val yMin = y.min
    val yMax = y.max
    if (yMax == yMin) return Seq.empty
    val yn = y.map(v => (v - yMin) / (yMax - yMin))
    // 2. difference curve for convex/increasing: yd = yn - x ... knee where
    //    yd has a local MINIMUM (curve below the diagonal); Kneedle's
    //    canonical form flips the curve to concave/increasing and looks for
    //    local maxima of (x - yn) equivalently.
    val yd = Array.tabulate(n)(i => x(i) - yn(i))
    // 3. local maxima of the difference curve
    val lmx = (1 until n - 1).filter(i => yd(i) > yd(i - 1) && yd(i) >= yd(i + 1))
    if (lmx.isEmpty) return Seq.empty
    // 4. threshold per local max: T = yd(lmx) - S * mean(dx)
    val meanDx = 1.0 / (n - 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (m <- lmx) {
      val t = yd(m) - sensitivity * meanDx
      // elbow confirmed only if yd drops below T before the next local
      // max (or curve end) — canonical Kneedle; an unconfirmed final
      // local max is NOT auto-accepted, so sensitivity stays meaningful
      val nextLmx = lmx.find(_ > m).getOrElse(n - 1)
      val confirmed = ((m + 1) to nextLmx).exists(i => yd(i) < t)
      if (confirmed) out += m
    }
    out.toSeq
  }

  /** The reference's ε-search: max elbow's y-value (ε = curve value at the
    * last confirmed elbow; word2vec_dbscan_approach.ipynb:30025 found
    * ε=7.55). None when the curve has no knee. */
  def epsilonSearch(curve: Array[Double], sensitivity: Double = 1.0)
      : Option[Double] =
    elbows(curve, sensitivity) match {
      case Nil => None
      case es => Some(curve(es.max))
    }
}
