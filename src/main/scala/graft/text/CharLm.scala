package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-trigram language-model quality scoring — the CCNet-style
  * perplexity filter of pretraining pipelines (score each document by
  * how surprising its character stream is under a model trained on a
  * trusted reference corpus; outliers in either direction are junk:
  * too-predictable = boilerplate, too-surprising = noise/binary).
  *
  * Model: add-one-smoothed conditional trigram probabilities
  * p(c₃|c₁c₂) = (count(tri) + 1) / (count(prefix) + A), A = alphabet
  * size of the training corpus. Score: mean −ln p over a document's
  * trigram positions (length ≥ 3 docs), 1e-6-quantized for the exact
  * DuckDB twin.
  *
  * Scale shape: the model is ALPHABET-BOUNDED — at most A³ trigram rows
  * and A² prefix rows regardless of corpus size — so the scoring joins
  * broadcast at any scale (AQE does this on its own; the tables are KBs
  * to MBs). Training is one explode + groupBy (map-side partial
  * aggregation); scoring is one explode + two broadcast joins + one
  * per-doc aggregation. Everything is codegen'd relational ops — no UDF.
  */
object CharLm {

  /** One row per trigram position: (doc_id?, tri, pre). */
  private def positions(df: DataFrame, extra: Seq[String]): DataFrame =
    df.filter(length(col("text")) >= 3)
      .select(extra.map(col) :+ col("text") :+
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"): _*)
      .select(extra.map(col) :+
        expr("substring(text, i, 3)").as("tri") :+
        expr("substring(text, i, 2)").as("pre"): _*)

  /** Trigram and prefix count tables from a training frame, plus the
    * training alphabet size: ((tri, n_tri), (pre, n_pre), A).
    *
    * ONE corpus pass: only the trigram counts aggregate the corpus; the
    * prefix counts and the alphabet both derive EXACTLY from that
    * alphabet-bounded (≤ A³ rows) table —
    *  - every position i ∈ [1, len−2] carries both a 3-char `tri` and
    *    its 2-char `pre` = substring(tri, 1, 2), so
    *    n_pre(p) = Σ n_tri(t) over t with prefix p;
    *  - every char of a length ≥ 3 doc sits inside at least one trigram
    *    window (i ≤ j ≤ i+2 has a solution in [1, len−2] for every j),
    *    and trigram chars ⊆ doc chars, so the distinct-char sets are
    *    equal.
    * The previous form paid three full training passes (tri groupBy,
    * pre groupBy, per-CHAR explode + distinct for A). The aggregate is
    * localCheckpointed (alphabet-bounded, KBs–MBs) so the corpus pass
    * runs once even though the table feeds two joins plus the alphabet
    * count downstream. */
  def train(df: DataFrame, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    // fanOut: an unsplittable input (single small file / row group) runs
    // the explode + partial agg on ONE task otherwise; counts are
    // order-independent, so any deterministic key spreads the docs
    val pos = positions(graft.core.Tables.fanOut(
      df.select(col(textCol).as("text")), xxhash64(col("text"))), Nil)
    val triCounts = pos.groupBy("tri").agg(count(lit(1)).as("n_tri"))
      .localCheckpoint(true)
    val preCounts = triCounts
      .groupBy(substring(col("tri"), 1, 2).as("pre"))
      .agg(sum("n_tri").as("n_pre"))
    val alphabet = triCounts
      .select(explode(split(col("tri"), "")).as("ch"))
      .filter(col("ch") =!= "").distinct().count()
    (triCounts, preCounts, alphabet)
  }

  /** [[nllScore]] without the position EXPLODE — the scan form: the
    * (alphabet-bounded) count tables ride the plan as packed-long
    * literals and a codegen'd kernel (graft.expr.CharLmNll) slides the
    * trigram window, so scoring is a single whole-stage-codegen
    * projection with no joins, no position rows, and no ScalaUDF (same
    * trade as Curation.decontaminateScan; same oracle — the sequential
    * kernel sum and the join form's aggregation agree far inside the
    * shared 1e-6 quantization). Plan-shipped state: ≤ A³ + A² packed
    * (key, count) longs — bounded by the alphabet, not the corpus. */
  def nllScoreScan(docs: DataFrame, idCol: String, textCol: String,
                   triCounts: DataFrame, preCounts: DataFrame,
                   alphabet: Long): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(docs.sparkSession)
    // pack "abc" -> (a<<32)|(b<<16)|c (UTF-16 units, injective), sort by
    // key with counts in lockstep for the kernel's binary search
    def packed(df: DataFrame): (Array[Long], Array[Long]) = {
      val rows = df.collect().map { r =>
        val s = r.getString(0)
        var k = 0L
        var j = 0
        while (j < s.length) { k = (k << 16) | s.charAt(j); j += 1 }
        (k, r.getLong(1))
      }.sortBy(_._1)
      (rows.map(_._1), rows.map(_._2))
    }
    val (tk, tc) = packed(triCounts)
    val (pk, pc) = packed(preCounts)
    // fanOut: the kernel projection is the whole cost — on an
    // unsplittable input it would otherwise run single-task
    graft.core.Tables.fanOut(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        call_function("graft_charlm_nll", col(textCol),
          typedlit(tk), typedlit(tc), typedlit(pk), typedlit(pc),
          lit(alphabet.toDouble)).as("nll"))
      .filter(col("nll").isNotNull)
  }

  /** Mean −ln p(c₃|c₁c₂) per document under the trained tables — the
    * negative log-likelihood quality score (lower = more fluent under
    * the reference corpus). Documents shorter than 3 chars are excluded
    * (no trigram positions). */
  def nllScore(docs: DataFrame, idCol: String, textCol: String,
               triCounts: DataFrame, preCounts: DataFrame,
               alphabet: Long): DataFrame =
    // fanOut keyed on doc_id: the downstream groupBy(doc_id) reuses the
    // partitioning (no second exchange), and each doc's positions stay
    // whole inside one partition, so the per-doc avg accumulates in the
    // same order as the single-task plan — bit-identical results
    positions(graft.core.Tables.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        col("doc_id")), Seq("doc_id"))
      .join(triCounts, Seq("tri"), "left")
      .join(preCounts, Seq("pre"), "left")
      .select(col("doc_id"),
        log((coalesce(col("n_tri"), lit(0L)) + lit(1.0)) /
          (coalesce(col("n_pre"), lit(0L)) + lit(alphabet.toDouble)))
          .as("logp"))
      .groupBy("doc_id")
      .agg((round(avg(-col("logp")) * 1e6) / 1e6).as("nll"))
}
