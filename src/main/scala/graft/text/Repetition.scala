package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for pretraining-data curation, after
  * the Gopher filtering rules (Rae et al. 2021, §A1.1): documents whose
  * text is dominated by a few repeated n-grams are boilerplate/spam and
  * get filtered before training.
  *
  * Two signals per document:
  *  - `top_{n}gram_char_frac`: fraction of the document's characters
  *    covered by occurrences of its MOST FREQUENT word n-gram
  *    (count·len(gram) / len(text); ties broken by lexicographically
  *    greatest gram, deterministically).
  *  - `dup_{n}gram_frac`: fraction of n-gram POSITIONS whose gram occurs
  *    more than once in the document. (Gopher counts duplicated
  *    characters once; the position fraction is the same signal without
  *    the overlap bookkeeping, and is exactly SQL-expressible, which
  *    keeps the operator oracle-checkable.)
  *
  * Scale shape: explode word n-grams → two-phase count keyed by
  * (doc, gram) → per-doc fold. Work is linear in corpus token count and
  * every shuffle is keyed by doc_id(+gram) — no global state, no skew
  * beyond document length itself. */
object Repetition {

  /** Word n-gram array (space-joined) over a token array; empty when the
    * document has fewer than n tokens. */
  def wordNgrams(tokens: Column, n: Int): Column = {
    require(n >= 1)
    when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(typedLit(Array.empty[String]))
  }

  /** Per-document repetition signals; one row per input row with
    * (doc_id, top_{topN}gram, top_{topN}gram_frac, dup_{dupN}gram_frac).
    * Documents too short to form a gram get ('' , 0.0, 0.0). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      topN: Int = 2, dupN: Int = 5): DataFrame = {
    // fanOut: tokenize + two n-gram explodes are the scan's whole cost
    // (no-op past one scan split); counts and max(struct) are
    // order-independent, and groupBy(doc_id, ...) reuses the keyed
    // exchange (hash on the doc_id subset satisfies the clustering)
    val toks = graft.core.Tables.fanOut(df, col(idCol))
      .select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("double").as("n_chars"),
      Clean.splitWs(lower(col(textCol))).as("toks"))
    def gramCounts(n: Int): DataFrame = toks
      .select(col("doc_id"), col("n_chars"),
        explode(wordNgrams(col("toks"), n)).as("gram"))
      .groupBy("doc_id", "n_chars", "gram")
      .agg(count(lit(1)).as("cnt"))
    // max(struct(cnt, gram)) = highest count, ties to the greatest gram —
    // the same total order the oracle's ORDER BY cnt DESC, gram DESC uses
    val top = gramCounts(topN)
      .groupBy("doc_id", "n_chars")
      .agg(max(struct(col("cnt"), col("gram"))).as("top"))
      .select(col("doc_id"), col("top.gram").as("top_gram"),
        (col("top.cnt") * length(col("top.gram")) / col("n_chars"))
          .as("top_frac"))
    val dup = gramCounts(dupN)
      .groupBy("doc_id")
      .agg((sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)) /
        sum(col("cnt"))).as("dup_frac"))
    df.select(col(idCol).as("doc_id"))
      .join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top_gram"), lit("")).as(s"top_${topN}gram"),
        coalesce(col("top_frac"), lit(0.0)).as(s"top_${topN}gram_frac"),
        coalesce(col("dup_frac"), lit(0.0)).as(s"dup_${dupN}gram_frac"))
  }
}
