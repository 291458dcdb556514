package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions of the reference (SURVEY.md §2.8, F1–F10).
  *
  * All are compositions of codegen'd built-ins (no UDFs): they stay inside
  * whole-stage codegen and are pure column expressions, so Catalyst can
  * push/reorder them freely.
  */
object Clean {

  /** F1 lowercase. */
  def lowerCase(c: Column): Column = lower(c)

  /** F2 whitespace split (python `str.split()`: leading/trailing ws dropped). */
  def splitWs(c: Column): Column =
    split(trim(regexp_replace(c, "\\s+", " ")), " ")

  /** F3 whitespace normalize (`" ".join(s.split())`). */
  def normWs(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  // Masking regexes — verbatim semantics of the reference cleaners
  // (word2vec_dbscan_approach.ipynb:95-103).
  val LineNumberRe = "(at line[:]*\\s*\\d+)"
  val UidRe = "[0-9a-zA-Z]{12,128}"
  val UuidRe = "[a-f0-9]{8}-[a-f0-9]{4}-4[a-f0-9]{3}-[89aAbB][a-f0-9]{3}-[a-f0-9]{12}"

  /** F6 line-number masking. */
  def maskLineNumbers(c: Column): Column =
    regexp_replace(c, LineNumberRe, "at line LINE_NUMBER")

  /** F4 UID masking (12–128 char alphanumeric runs). */
  def maskUids(c: Column): Column = regexp_replace(c, UidRe, "UID")

  /** F5 UUID-v4 masking. */
  def maskUuids(c: Column): Column = regexp_replace(c, UuidRe, "UUID")

  /** The reference's full cleaning chain, ORDER PRESERVED (F6 → F4 → F5,
    * word2vec_dbscan_approach.ipynb:100-103 — F4 first would eat hex-ish
    * words before the UUID/line rules see them), then whitespace-normalized. */
  def cleanMessage(c: Column): Column =
    normWs(maskUuids(maskUids(maskLineNumbers(c))))

  /** F9 fuzzy similarity ratio — fuzzywuzzy's Levenshtein-ratio form:
    * 100 * (|a| + |b| - lev(a,b)) / (|a| + |b|). Exact SequenceMatcher
    * parity differs on transposition-heavy pairs; documented delta
    * (SURVEY.md §7 item 3). The distance comes from the bit-parallel
    * graft_levenshtein kernel — same value as the built-in `levenshtein`
    * (differentially spec-gated, LevSpec) at ~64× fewer word ops per
    * pair (6.9 s → ~1 s on the sf0.1 adjacent-pair fixture); the session
    * must have the graft functions registered. */
  def fuzzRatio(a: Column, b: Column): Column = {
    val la = length(a)
    val lb = length(b)
    when(la + lb === 0, lit(100.0))
      .otherwise(lit(100.0) * (la + lb -
        call_function("graft_levenshtein", a, b)) / (la + lb))
  }

  /** The Treebank rule cascade, defined ONCE as (java pattern, java
    * replacement, RE2/DuckDB pattern, DuckDB replacement) so the Column
    * chain and the DuckDB oracle twin are generated from the same table
    * and cannot drift. Patterns are the published TreebankWordTokenizer
    * regex cascade (starting quotes → punctuation → parens/dashes → pad →
    * ending quotes → MacIntyre contractions); the NLTK lookahead in the
    * `wanna` rule is expressed as a captured whitespace (RE2 has no
    * lookahead — token output is identical after whitespace split). */
  private[text] val TreebankRules: Seq[(String, String, String, String)] = {
    def same(p: String, jRepl: String, dRepl: String) = (p, jRepl, p, dRepl)
    Seq(
      // STARTING_QUOTES
      same("^\"", "``", "``"),
      same("(``)", " $1 ", " \\1 "),
      same("([ \\(\\[{<])(\"|'{2})", "$1 `` ", "\\1 `` "),
      // PUNCTUATION
      same("([:,])([^\\d])", " $1 $2", " \\1 \\2"),
      same("([:,])$", " $1 ", " \\1 "),
      same("\\.\\.\\.", " ... ", " ... "),
      same("([;@#$%&])", " $1 ", " \\1 "),
      same("([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$", "$1 $2$3 ", "\\1 \\2\\3 "),
      same("([?!])", " $1 ", " \\1 "),
      same("([^'])' ", "$1 ' ", "\\1 ' "),
      // PARENS_BRACKETS + DOUBLE DASHES
      same("([\\]\\[\\(\\)\\{\\}<>])", " $1 ", " \\1 "),
      same("(--)", " $1 ", " \\1 "),
      // ---- pad marker: " " + text + " " happens between these ----
      ("<PAD>", "", "<PAD>", ""),
      // ENDING_QUOTES
      same("\"", " '' ", " '' "),
      same("(\\S)('')", "$1 $2 ", "\\1 \\2 "),
      same("([^' ])('[sS]|'[mM]|'[dD]|') ", "$1 $2 ", "\\1 \\2 "),
      same("([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", "$1 $2 ",
        "\\1 \\2 "),
      // MacIntyre CONTRACTIONS2/3
      same("(?i)\\b(can)(not)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(d)('ye)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(gim)(me)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(gon)(na)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(got)(ta)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(lem)(me)\\b", " $1 $2 ", " \\1 \\2 "),
      // tokenizer.sed: s=\b\([Mm]\)ore'n\b=\1ore 'n=g → "more" + "'n"
      same("(?i)\\b(more)('n)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i)\\b(wan)(na)(\\s)", " $1 $2$3", " \\1 \\2\\3"),
      same("(?i) ('t)(is)\\b", " $1 $2 ", " \\1 \\2 "),
      same("(?i) ('t)(was)\\b", " $1 $2 ", " \\1 \\2 "))
  }

  /** F7 full Treebank tokenization — the whole published rule cascade as
    * nested codegen'd regexp_replace (no UDF). See [[TreebankRules]];
    * [[tokenizeTreebankish]] remains the cheaper path-preserving variant
    * the reference's own notes accept. */
  def tokenizeTreebankFull(c: Column): Column = {
    val full = TreebankRules.foldLeft(c) {
      case (acc, ("<PAD>", _, _, _)) => concat(lit(" "), acc, lit(" "))
      case (acc, (p, r, _, _)) => regexp_replace(acc, p, r)
    }
    filter(splitWs(full), t => length(t) > 0)
  }

  /** DuckDB twin of [[tokenizeTreebankFull]] over column expression
    * `inner`: the same cascade, emitted as nested regexp_replace SQL. */
  def tokenizeTreebankFullSql(inner: String): String = {
    def q(s: String) = s.replace("'", "''")
    val full = TreebankRules.foldLeft(inner) {
      case (acc, ("<PAD>", _, _, _)) => s"(' ' || $acc || ' ')"
      case (acc, (_, _, p, r)) =>
        s"regexp_replace($acc, '${q(p)}', '${q(r)}', 'g')"
    }
    s"list_filter(string_split(trim(regexp_replace($full, '\\s+', ' ', 'g'))," +
      " ' '), t -> t != '')"
  }

  /** F9 EXACT parity form: difflib `SequenceMatcher.ratio()` scaled to
    * 0–100 with Python-3 (banker's) rounding — bit-for-bit what
    * fuzzywuzzy's `fuzz.ratio` computes on its difflib path, including
    * autojunk (see graft.expr.SeqRatio). Session must have the graft
    * functions registered. [[fuzzRatio]] remains the cheaper
    * Levenshtein-ratio variant (codegen'd builtin, no per-row kernel). */
  def fuzzRatioExact(a: Column, b: Column): Column =
    bround(call_function("graft_seq_ratio", a, b) * 100)
      .cast("int") // bround = HALF_EVEN, matching Python-3 round

  /** URL canonicalization — the pre-pass of every crawl-dedup pipeline
    * (two fetches of one resource must collide BEFORE content dedup ever
    * runs): lowercase scheme+host, strip the scheme's default port
    * (:80/:443), strip trailing path slashes (bare host → "/"), drop
    * `utm_*` tracking params and empty params (other params kept in
    * order), drop the fragment. Pure builtin regexp/string/HOF chain —
    * codegen'd, embarrassingly parallel, and expressible 1:1 in the
    * DuckDB twin (same regexes, list_filter ↔ filter). */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    // strip trailing slashes FIRST, then map the empty result to "/":
    // an all-slash path ("//") must land on "/" like "" and "/" do —
    // stripping inside an otherwise-branch left it as "" (non-idempotent
    // output, and the very collisions this pre-pass exists for missed)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val q = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(q, "&"), p => !p.startsWith("utm_") && p =!= ""), "&")
    concat(scheme, lit("://"), host, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** F7 Treebank-ish tokenization as a pure regex pipeline. The reference
    * picked TreebankWordTokenizer because it keeps file paths/URLs intact
    * (word2vec_dbscan_approach.ipynb:105-116); we reproduce the load-bearing
    * rules (separate standard punctuation, keep path-like runs) while
    * staying inside codegen. Known-imperfect parity is accepted by the
    * reference itself (its `[70]` bracket complaint, ipynb:28542-28546). */
  def tokenizeTreebankish(c: Column): Column = {
    // Pad the punctuation Treebank splits off when it is word-adjacent;
    // leave ., :, /, -, _ inside tokens so paths and URLs survive.
    val padded =
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "([\\[\\](){}<>!?;,\"])", " $1 "),
          "(\\S)(:)(\\s|$)", "$1 $2$3"),          // trailing colon only
        "(^|\\s)(')", "$1$2 ")                     // leading quote
    filter(splitWs(padded), t => length(t) > 0)
  }
}
