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
    * training alphabet size: ((tri, n_tri), (pre, n_pre), A). */
  def train(df: DataFrame, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    val pos = positions(df.select(col(textCol).as("text")), Nil)
    val triCounts = pos.groupBy("tri").agg(count(lit(1)).as("n_tri"))
    val preCounts = pos.groupBy("pre").agg(count(lit(1)).as("n_pre"))
    val alphabet = df.select(explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "").distinct().count()
    (triCounts, preCounts, alphabet)
  }

  /** [[nllScore]] without the position EXPLODE — the scan form: the
    * (alphabet-bounded) count tables broadcast as plain hash maps and a
    * per-row kernel slides the trigram window, so scoring is a single
    * projection pass with no joins and no position rows (same trade as
    * Curation.decontaminateScan; same oracle — the sequential kernel sum
    * and the join form's aggregation agree far inside the shared 1e-6
    * quantization). Driver/broadcast boundary: ≤ A³ + A² map entries —
    * bounded by the alphabet, not the corpus. */
  def nllScoreScan(docs: DataFrame, idCol: String, textCol: String,
                   triCounts: DataFrame, preCounts: DataFrame,
                   alphabet: Long): DataFrame = {
    val spark = docs.sparkSession
    def toMap(df: DataFrame): java.util.HashMap[String, Long] = {
      val m = new java.util.HashMap[String, Long]()
      df.collect().foreach(r => m.put(r.getString(0), r.getLong(1)))
      m
    }
    val triB = spark.sparkContext.broadcast(toMap(triCounts))
    val preB = spark.sparkContext.broadcast(toMap(preCounts))
    val a = alphabet.toDouble
    val score = udf { text: String =>
      if (text == null || text.length < 3) None
      else {
        val tri = triB.value
        val pre = preB.value
        var s = 0.0
        var i = 0
        val n = text.length - 2
        while (i < n) {
          val t3 = text.substring(i, i + 3)
          val t2 = text.substring(i, i + 2)
          val nt = tri.getOrDefault(t3, 0L)
          val np = pre.getOrDefault(t2, 0L)
          s -= math.log((nt + 1.0) / (np + a))
          i += 1
        }
        Some(math.round(s / n * 1e6) / 1e6)
      }
    }
    docs.select(col(idCol).as("doc_id"), score(col(textCol)).as("nll"))
      .filter(col("nll").isNotNull)
  }

  /** Mean −ln p(c₃|c₁c₂) per document under the trained tables — the
    * negative log-likelihood quality score (lower = more fluent under
    * the reference corpus). Documents shorter than 3 chars are excluded
    * (no trigram positions). */
  def nllScore(docs: DataFrame, idCol: String, textCol: String,
               triCounts: DataFrame, preCounts: DataFrame,
               alphabet: Long): DataFrame =
    positions(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), Seq("doc_id"))
      .join(triCounts, Seq("tri"), "left")
      .join(preCounts, Seq("pre"), "left")
      .select(col("doc_id"),
        log((coalesce(col("n_tri"), lit(0L)) + lit(1.0)) /
          (coalesce(col("n_pre"), lit(0L)) + lit(alphabet.toDouble)))
          .as("logp"))
      .groupBy("doc_id")
      .agg((round(avg(-col("logp")) * 1e6) / 1e6).as("nll"))
}
