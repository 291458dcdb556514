package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level curation filters a pretraining pipeline runs between
  * text extraction and dedup: Gopher's rule battery, C4's line-level
  * cleaning, and PII masking.
  *
  * All three are pure per-row column expressions (no UDFs, no shuffle) —
  * they run at scan speed over the corpus, and every rule is deterministic
  * and SQL-expressible so the operators carry exact DuckDB oracles.
  *
  * Sources are the published heuristics (Gopher: Rae et al. 2021 §A1.1;
  * C4: Raffel et al. 2020 §2.2) — the reference corpus has no equivalent
  * (builder-brief north-star operators).
  */
object Filters {

  /** Gopher rule battery: one row per doc with each signal, each rule's
    * verdict, and the conjunction `keep`. Thresholds are the published
    * defaults, parameterized where pipelines commonly tune them.
    *
    * Signals (all single divisions of exact integers, so the doubles are
    * bit-identical across engines):
    *  - word count ∈ [minTokens, maxTokens]
    *  - mean word length ∈ [3, 10]
    *  - symbol-to-word ratio (# and ...) < 0.1
    *  - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 English stopword hits
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(df.sparkSession)
    // token-level signals run on the native single-pass kernels
    // (graft.expr.TextKernels — compiled, no token-array materialization);
    // greatest(·,1) in the denominators reproduces the old
    // size(splitWs) ≥ 1 semantics exactly. Line-level signals keep the
    // HOF form: docs have few lines, and the line array is one split.
    val base = df.select(
      col(idCol).as("doc_id"),
      col(textCol).as("text"),
      split(col(textCol), "\n").as("lines"))
    val nTokD = greatest(call_function("graft_ws_token_count", col("text")),
      lit(1)).cast("double")
    val stats = base.select(
      col("doc_id"),
      TextStats.tokenCountWs(col("text")).cast("long").as("n_tokens"),
      // sum of word lengths = count of non-whitespace chars (exact,
      // no per-token aggregate needed)
      (call_function("graft_nonws_char_count", col("text")).cast("double") /
        nTokD).as("mean_word_len"),
      ((regexp_count(col("text"), lit("#")) +
        regexp_count(col("text"), lit("\\.\\.\\."))).cast("double") /
        nTokD).as("sym_ratio"),
      (size(filter(col("lines"), l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("double") /
        size(col("lines")).cast("double")).as("bullet_frac"),
      (size(filter(col("lines"), l =>
        substring(rtrim(l), -3, 3) === "...")).cast("double") /
        size(col("lines")).cast("double")).as("ellipsis_frac"),
      (call_function("graft_letter_token_count", col("text")).cast("double") /
        nTokD).as("alpha_frac"),
      TextStats.stopHitCount(lower(col("text")), TextStats.gopherStops)
        .cast("long").as("stop_hits"))
    stats.withColumn("keep",
      col("n_tokens").between(minTokens, maxTokens) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("sym_ratio") < 0.1 &&
        col("bullet_frac") <= 0.9 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2L)
  }

  /** C4 line-level cleaning: keep only lines that end in terminal
    * punctuation (after right-trim) AND contain ≥ `minLineWords` words;
    * drop the whole document (empty `cleaned`) when it contains
    * "lorem ipsum" (case-insensitive) or a curly brace — the published
    * boilerplate/code tells. Returns (doc_id, n_lines_kept, cleaned). */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = 5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keepLine = (l: Column) =>
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"", "'") &&
        size(Clean.splitWs(l)) >= minLineWords
    val kept = filter(lines, keepLine)
    val bad = lower(col(textCol)).contains("lorem ipsum") ||
      col(textCol).contains("{")
    df.select(
      col(idCol).as("doc_id"),
      when(bad, lit(0L)).otherwise(size(kept).cast("long"))
        .as("n_lines_kept"),
      when(bad, lit("")).otherwise(concat_ws("\n", kept)).as("cleaned"))
  }

  /** PII patterns — the portable regex subset (no backreferences, no
    * lookaround) so Java regex (Spark) and RE2 (DuckDB oracle) agree. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII masking: emails → <EMAIL>, IPv4 → <IP>, phone-shaped numbers →
    * <PHONE>, applied in that order; per-kind match counts (on the
    * original text, so the counts are order-independent) ride along.
    * Returns (doc_id, masked, n_email, n_ip, n_phone). */
  /** Global (corpus-wide) line dedup — the RefinedWeb/Gopher move C4's
    * per-doc cleaning doesn't make: a line that occurs ANYWHERE else in
    * the corpus is removed everywhere except its first occurrence
    * (ordered by doc id, then position — deterministic), and documents
    * are reassembled from their surviving lines in order. Kills
    * cross-site boilerplate (nav bars, cookie banners, license footers)
    * that per-doc rules cannot see.
    *
    * Scale shape: first-occurrence selection is an AGGREGATION —
    * `min(struct(doc_id, pos))` per line — not a window: map-side
    * partial combine collapses every partition's occurrences of a hot
    * line (a cookie banner in a billion docs) to ONE candidate row
    * before the exchange, where a `row_number` window would funnel all
    * of them into a single partition and straggle. The aggregate result
    * IS the kept set (one row per distinct line), so no join back is
    * needed — two partial-agg shuffles total (by line, then by doc). At
    * 100 TB the first exchange would key on `xxhash64(line)` (8 bytes
    * through the shuffle — same move as decontaminate's gram keys); the
    * string form is kept so the operator carries an exact DuckDB twin.
    * Documents whose every line was a later duplicate drop out of the
    * result (same as the twin). */
  def globalLineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .groupBy("line")
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.pos").as("pos"),
        col("line"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("text_dedup"))

  /** Boilerplate strip — the frequency-threshold companion to
    * [[globalLineDedup]]: a line occurring MORE than `maxCount` times
    * corpus-wide is boilerplate (nav bars, cookie banners, subscribe
    * prompts) and is removed from EVERY document — including the first
    * occurrence, which first-occurrence dedup would keep. Documents are
    * reassembled from surviving lines in order; every input doc keeps a
    * row (fully-stripped docs surface with empty text and n_kept = 0, so
    * a downstream emptiness filter is an explicit decision, not a silent
    * drop). Returns (doc_id, text_clean, n_kept, n_stripped).
    *
    * Scale shape: the frequency pass is the same map-side-combining
    * aggregate as [[globalLineDedup]] (hot boilerplate collapses to one
    * row per partition before the exchange), and only lines OVER the
    * threshold survive its filter — the join back to the exploded corpus
    * therefore carries the (small, by construction ≤ total/maxCount
    * lines) boilerplate set, broadcast so the corpus side never
    * reshuffles on the line key. At 100 TB both sides would key on
    * `xxhash64(line)` (8-byte shuffle keys) and an over-broadcast-size
    * boilerplate set would fall back to a shuffle join; the string form
    * is kept so the operator carries an exact DuckDB twin. */
  def boilerplateStrip(df: DataFrame, idCol: String, textCol: String,
                       maxCount: Long = 3L): DataFrame = {
    val exploded = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = exploded.groupBy("line")
      .agg(count(lit(1)).as("_c")).filter(col("_c") > maxCount)
      .select(col("line"), lit(true).as("_bp"))
    exploded.join(broadcast(boiler), Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("_bp").isNull, struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("text_clean"),
        count(when(col("_bp").isNull, lit(1))).as("n_kept"),
        count(col("_bp")).as("n_stripped"))
  }

  def maskPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("masked"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phone"))
}
