package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq("a", "b", "a")),
    (1L, Seq("b", "c")),
    (2L, Seq("c", "c", "c", "d"))).toDF("doc_id", "tokens")

  test("termFreq: per-doc tf sums to 1") {
    val sums = Tfidf.termFreq(corpus, "doc_id", "tokens")
      .groupBy("doc_id").agg(sum("tf").as("s")).as[(Long, Double)].collect()
    sums.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-12) }
  }

  test("docFreqIdf: idf = ln(N/df) (1e-6 quantized), monotone in df") {
    val idf = Tfidf.docFreqIdf(corpus, "doc_id", "tokens", 3L)
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // df: a∈{0}=1, b∈{0,1}=2, c∈{1,2}=2, d∈{2}=1
    assert(idf("a")._1 == 1L)
    assert(math.abs(idf("a")._2 - math.log(3.0)) < 1e-6)
    assert(idf("b")._1 == 2L)
    assert(idf("c")._1 == 2L)
    assert(math.abs(idf("c")._2 - math.log(1.5)) < 1e-6)
    assert(idf("a")._2 > idf("b")._2 && idf("b")._2 == idf("c")._2)
  }

  test("vocab = distinct token union (A8)") {
    val v = Tfidf.vocab(corpus, "doc_id", "tokens").as[String].collect().sorted
    assert(v.toSeq == Seq("a", "b", "c", "d"))
  }

  test("pruneVocab drops tokens outside [minDf, maxDf] ratio") {
    // df: a∈{0}=1/3, b∈{0,1}=2/3, c∈{1,2}=2/3, d∈{2}=1/3
    val kept = Tfidf.pruneVocab(corpus, "doc_id", "tokens", 3L,
      minDf = 0.4, maxDf = 0.9).select("token").as[String].collect().sorted
    assert(kept.toSeq == Seq("b", "c"))
  }

  test("relational tfidf differentially matches the vectorized pipeline's " +
    "document frequencies (the reference's own cross-check)") {
    // tokens chosen to avoid the pipeline's English stopword list
    val docs = Seq((0L, "aa bb aa"), (1L, "bb cc"), (2L, "cc cc cc dd"))
      .toDF("doc_id", "text")
    val pipe = TextPipeline.tfidfPipeline(minDF = 1.0, maxDF = 3.0).fit(docs)
    val cvModel = pipe.stages(2)
      .asInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]
    val toks = docs.select(col("doc_id"),
      graft.text.Clean.splitWs(col("text")).as("tokens"))
    val relVocab = Tfidf.vocab(toks, "doc_id", "tokens")
      .as[String].collect().toSet
    assert(cvModel.vocabulary.toSet == relVocab)
  }

  test("bm25TopK matches the closed-form score on a hand corpus") {
    // 4 docs; query {x, b}: x appears only in doc 3, b in docs 0/1
    val docs = Seq(
      (0L, Seq("a", "b", "a")),       // len 3, tf(b)=1
      (1L, Seq("b", "b", "c")),       // len 3, tf(b)=2
      (2L, Seq("c", "d")),            // len 2, no hit
      (3L, Seq("x", "a", "a", "a"))). // len 4, tf(x)=1
      toDF("doc_id", "tokens")
    val got = Tfidf.bm25TopK(docs, "doc_id", "tokens", Seq("x", "b"), 10)
      .as[(Long, Double)].collect().toMap
    val (k1, b, n, avgdl) = (1.2, 0.75, 4.0, 3.0)
    def idf(df: Int) = math.round(
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6) / 1e6
    def w(df: Int, tf: Int, dl: Int) = idf(df) * tf * (k1 + 1) /
      (tf + k1 * (1 - b + b * dl / avgdl))
    def q6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.keySet == Set(0L, 1L, 3L)) // doc 2 has no query term
    assert(math.abs(got(0L) - q6(w(2, 1, 3))) < 1e-9)
    assert(math.abs(got(1L) - q6(w(2, 2, 3))) < 1e-9)
    assert(math.abs(got(3L) - q6(w(1, 1, 4))) < 1e-9)
    // the rare term (df=1) outranks a single common-term hit
    assert(got(3L) > got(0L))
  }

  test("bm25TopK honors k with the deterministic (score desc, id) order") {
    val docs = Seq((0L, Seq("t")), (1L, Seq("t")), (2L, Seq("t")))
      .toDF("doc_id", "tokens")
    // identical docs -> identical scores -> ties break on ascending id
    val ids = Tfidf.bm25TopK(docs, "doc_id", "tokens", Seq("t"), 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(0L, 1L))
  }
}
