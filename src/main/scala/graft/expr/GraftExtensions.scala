package graft.expr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extensions: native expressions registered into the session's
  * function registry, so SQL and the Column API (`call_function`) reach
  * them. Install with `spark.sql.extensions=graft.expr.GraftExtensions`,
  * or imperatively via [[GraftFunctions.ensureRegistered]] (operators do
  * this on first use, so an unconfigured session still works).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DedupComputeRewrite)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val minHash: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (args: Seq[Expression]) => args match {
      case Seq(s) => MinHashSig(s, 32, 8, 4)
      case Seq(s, k, g, st) =>
        MinHashSig(s, intLit(k, "k"), intLit(g, "gram"), intLit(st, "stride"))
      case _ => throw new IllegalArgumentException(
        "graft_minhash(text[, k, gram, stride])")
    })

  private val rhpBits: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_rhp_bits"),
    new ExpressionInfo(classOf[RhpBits].getName, "graft_rhp_bits"),
    (args: Seq[Expression]) => args match {
      case Seq(v) => RhpBits(v, 32, 42)
      case Seq(v, b, s) => RhpBits(v, intLit(b, "bits"), intLit(s, "seed"))
      case _ => throw new IllegalArgumentException(
        "graft_rhp_bits(vec[, bits, seed])")
    })

  private def binaryVec(name: String, make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(make(Literal(0), Literal(0)).getClass.getName, name),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => make(a, b)
      case _ => throw new IllegalArgumentException(s"$name(vecA, vecB)")
    })

  private val cdcCuts: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_cdc_cuts"),
    new ExpressionInfo(classOf[GraftCdcCuts].getName, "graft_cdc_cuts"),
    (args: Seq[Expression]) => args match {
      case Seq(s) => GraftCdcCuts(s, 16, 128, 6)
      case Seq(s, mn, mx, mb) => GraftCdcCuts(s, intLit(mn, "minLen"),
        intLit(mx, "maxLen"), intLit(mb, "maskBits"))
      case _ => throw new IllegalArgumentException(
        "graft_cdc_cuts(text[, minLen, maxLen, maskBits])")
    })

  private val nnTopK: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_nn_topk"),
    new ExpressionInfo(classOf[NnTopK].getName, "graft_nn_topk"),
    (args: Seq[Expression]) => args match {
      case Seq(v, m, k) => NnTopK(v, m, intLit(k, "k"))
      case _ => throw new IllegalArgumentException(
        "graft_nn_topk(vec, matrixLiteral, k)")
    })

  private def unaryText(name: String, make: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(make(Literal(0)).getClass.getName, name),
    (args: Seq[Expression]) => args match {
      case Seq(a) => make(a)
      case _ => throw new IllegalArgumentException(s"$name(text)")
    })

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private val stopHits: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_stop_hits"),
    new ExpressionInfo(classOf[StopHits].getName, "graft_stop_hits"),
    (args: Seq[Expression]) => args match {
      case text +: stops if stops.nonEmpty =>
        StopHits(text, stops.map(strLit(_, "stop word")))
      case _ => throw new IllegalArgumentException(
        "graft_stop_hits(text, stop1[, stop2, ...])")
    })

  private val winnow: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[GraftWinnow].getName, "graft_winnow"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => GraftWinnow(t, 8, 4)
      case Seq(t, k, w) =>
        GraftWinnow(t, intLit(k, "k"), intLit(w, "window"))
      case _ => throw new IllegalArgumentException(
        "graft_winnow(text[, k, window])")
    })

  private val winnowKr: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_winnow_kr"),
    new ExpressionInfo(classOf[GraftWinnow].getName, "graft_winnow_kr"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => GraftWinnow(t, 8, 4, kr = true)
      case Seq(t, k, w) =>
        GraftWinnow(t, intLit(k, "k"), intLit(w, "window"), kr = true)
      case _ => throw new IllegalArgumentException(
        "graft_winnow_kr(text[, k, window])")
    })

  private val charLmNll: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_charlm_nll"),
    new ExpressionInfo(classOf[CharLmNll].getName, "graft_charlm_nll"),
    (args: Seq[Expression]) => args match {
      case Seq(t, tk, tc, pk, pc, a) => CharLmNll(t, tk, tc, pk, pc, a)
      case _ => throw new IllegalArgumentException(
        "graft_charlm_nll(text, triKeys, triCounts, preKeys, preCounts, alphabet)")
    })

  private val gramHits: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_gram_hits"),
    new ExpressionInfo(classOf[GramHits].getName, "graft_gram_hits"),
    (args: Seq[Expression]) => args match {
      case Seq(t, h, n) => GramHits(t, h, intLit(n, "n"))
      case _ => throw new IllegalArgumentException(
        "graft_gram_hits(tokens, sortedHashes, n)")
    })

  private val dsirLogW: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_dsir_logw"),
    new ExpressionInfo(classOf[DsirLogW].getName, "graft_dsir_logw"),
    (args: Seq[Expression]) => args match {
      case Seq(t, r) => DsirLogW(t, r)
      case _ => throw new IllegalArgumentException(
        "graft_dsir_logw(text, ratios)")
    })

  private val dsirBuckets: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_dsir_buckets"),
    new ExpressionInfo(classOf[DsirBuckets].getName, "graft_dsir_buckets"),
    (args: Seq[Expression]) => args match {
      case Seq(t, b) => DsirBuckets(t, b)
      case _ => throw new IllegalArgumentException(
        "graft_dsir_buckets(text, buckets)")
    })

  private val bloomContains: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
    (args: Seq[Expression]) => args match {
      case Seq(v, b) => BloomContains(v, b)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_contains(hash, bloomBytes)")
    })

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(minHash, rhpBits, nnTopK,
    winnow, winnowKr, charLmNll, gramHits, bloomContains, dsirLogW,
    dsirBuckets, cdcCuts,
    binaryVec("graft_dot", GraftDot(_, _)),
    binaryVec("graft_l2_dist", GraftL2Dist(_, _)),
    binaryVec("graft_l2_sq", GraftL2Sq(_, _)),
    binaryVec("graft_cos_sim", GraftCosSim(_, _)),
    binaryVec("graft_cos_sim_i8", GraftCosSimI8(_, _)),
    unaryText("graft_quantize_i8", GraftQuantizeI8(_)),
    binaryVec("graft_seq_ratio", GraftSeqRatio(_, _)),
    binaryVec("graft_bpe_encode", BpeEncode(_, _)),
    binaryVec("graft_bpe_count", BpeCount(_, _)),
    binaryVec("graft_levenshtein", GraftLevenshtein(_, _)),
    unaryText("graft_ws_token_count", WsTokenCount(_)),
    unaryText("graft_deflate_ratio", DeflateRatio(_)),
    unaryText("graft_nonws_char_count", NonWsCharCount(_)),
    unaryText("graft_non_alnum_count", NonAlnumCount(_)),
    unaryText("graft_letter_token_count", LetterTokenCount(_)),
    unaryText("graft_bpeish_count", BpeishCount(_)),
    unaryText("graft_simhash_md5", SimHashMd5(_)),
    unaryText("graft_nfc", NfcNormalize(_)),
    unaryText("graft_strip_accents", StripAccents(_)),
    stopHits,
    (new FunctionIdentifier("graft_ngram_jaccard"),
      new ExpressionInfo(classOf[NgramJaccard].getName, "graft_ngram_jaccard"),
      ((args: Seq[Expression]) => args match {
        case Seq(a, b) => NgramJaccard(a, b, 3)
        case Seq(a, b, g) => NgramJaccard(a, b, intLit(g, "gram"))
        case _ => throw new IllegalArgumentException(
          "graft_ngram_jaccard(a, b[, gram])")
      }): FunctionRegistry.FunctionBuilder))

  /** Idempotently register the engine functions in `spark`'s session
    * registry (for sessions built without the extensions config). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
