package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.text.Clean
import scala.collection.mutable

/** Exact corpus heavy hitters — "every token appearing in more than 1/k
  * of all token positions" — via the classic two-pass scheme:
  *
  *   pass 1: per-partition Misra–Gries summaries of `k` counters,
  *     tree-merged (MG summaries are mergeable with additive error —
  *     Agarwal et al., Mergeable Summaries, PODS'12): every token with
  *     true frequency > N/(k+1) is GUARANTEED to survive. No shuffle at
  *     all — the only thing that moves is k (token, count) pairs per
  *     partition.
  *   pass 2: exact recount restricted to the ≤ k surviving candidates —
  *     the explode is filtered to candidates BEFORE the aggregation, so
  *     the shuffle carries only candidate tokens (≤ k distinct keys),
  *     never the corpus vocabulary.
  *
  * The output is EXACT (the sketch only proposes; the recount decides),
  * so the operator carries a plain SQL oracle despite the approximate
  * machinery — the 100-TB path never pays the full vocabulary
  * value_counts shuffle that the naive formulation (A3 on tokens) does.
  */
object HeavyHitters {

  /** Misra–Gries summary: at most `cap` counters; decrement-all when a
    * new key arrives at capacity. Estimates undercount by at most
    * N/(cap+1); merge (counter add + subtract the (cap+1)-th largest)
    * preserves the bound over the COMBINED stream. */
  final class MgSummary(val cap: Int) extends Serializable {
    require(cap > 0)
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    /** Total stream length N — carried by the summary (MG summaries
      * naturally track it), so the caller never rescans for it. */
    var n: Long = 0L

    def add(token: String): Unit = {
      n += 1
      counts.get(token) match {
        case Some(c) => counts.update(token, c + 1)
        case None if counts.size < cap => counts.update(token, 1L)
        case None => // decrement-all: consumes cap+1 count units, O(cap)
          val dead = mutable.ArrayBuffer[String]()
          for ((t, c) <- counts) {
            if (c == 1L) dead += t else counts.update(t, c - 1)
          }
          dead.foreach(counts.remove)
      }
    }

    def merge(other: MgSummary): MgSummary = {
      n += other.n
      for ((t, c) <- other.counts)
        counts.update(t, counts.getOrElse(t, 0L) + c)
      if (counts.size > cap) {
        // subtract the (cap+1)-th largest count from all, drop <= 0
        val kth = counts.values.toArray.sortBy(-_).apply(cap)
        val dead = mutable.ArrayBuffer[String]()
        for ((t, c) <- counts) {
          if (c <= kth) dead += t else counts.update(t, c - kth)
        }
        dead.foreach(counts.remove)
      }
      this
    }
  }

  /** MG candidate set + total token count N of the token multiset in
    * `tokens` (one array per row): at most `cap` tokens, superset of
    * every token with frequency > N/(cap+1). One pass, no shuffle. */
  def mgCandidates(tokens: Dataset[Seq[String]], cap: Int)
      : (Seq[String], Long) = {
    val s = tokens.rdd.treeAggregate(new MgSummary(cap))(
      (s, toks) => { toks.foreach(s.add); s },
      (a, b) => a.merge(b))
    (s.counts.keys.toSeq.sorted, s.n)
  }

  /** Exact tokens (lowercased, whitespace) with count·k > N over the
    * corpus, (token, cnt) descending. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
      Clean.splitWs(Clean.lowerCase(col(textCol))).as("toks"))
    // the sketch pass carries N, so the scheme is genuinely two-pass
    val (candidates, total) = mgCandidates(toks.as[Seq[String]], k)
    if (candidates.isEmpty) {
      return spark.emptyDataFrame
        .select(lit("").as("token"), lit(0L).as("cnt")).limit(0)
    }
    toks.select(explode(col("toks")).as("token"))
      .filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > total)
      .orderBy(desc("cnt"), col("token"))
  }
}
