package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary drift — Jensen–Shannon divergence between the
  * whitespace-token unigram distributions of two corpora (add-one
  * smoothing over the UNION vocabulary, natural log). The standard
  * data-mixture health check of a pretraining pipeline: a crawl refresh
  * or a new source whose JSD against the reference mixture spikes gets
  * eyeballed before it trains.
  *
  * JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q). Symmetric, bounded by
  * ln 2, and 0 iff the distributions agree — well-defined here for any
  * pair of corpora because smoothing puts mass on every union token:
  * p(t) = (count_P(t)+1)/(tokens_P + |V∪|), likewise q.
  *
  * Scale shape: one explode + groupBy per corpus (map-side combine; the
  * shuffle carries one row per distinct token), a full outer join of two
  * |vocab|-row frames, a broadcast 1-row totals cross join, and a scalar
  * aggregation — everything after the counts is bounded by the
  * vocabulary, not the corpus. */
object VocabDrift {

  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Clean.splitWs(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** One row: (jsd, vocab_union, tokens_a, tokens_b); jsd 1e-6-quantized
    * so the DuckDB twin hash-matches despite FP sum order. */
  def jsd(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val counts = tokenCounts(a, textCol).withColumnRenamed("n", "na")
      .join(tokenCounts(b, textCol).withColumnRenamed("n", "nb"),
        Seq("token"), "full_outer")
      .select(coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val totals = counts.agg(sum("na").as("ta"), sum("nb").as("tb"),
      count(lit(1)).as("v"))
    val pa = (col("na") + 1.0) / (col("ta") + col("v"))
    val pb = (col("nb") + 1.0) / (col("tb") + col("v"))
    val m = (pa + pb) / 2.0
    counts.crossJoin(broadcast(totals))
      .select(
        (pa * log(pa / m)).as("kla"),
        (pb * log(pb / m)).as("klb"),
        col("ta"), col("tb"), col("v"))
      .agg(
        (round((sum("kla") * 0.5 + sum("klb") * 0.5) * 1e6) / 1e6).as("jsd"),
        max("v").as("vocab_union"),
        max("ta").as("tokens_a"),
        max("tb").as("tokens_b"))
  }
}
