package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: sliding windows, short docs give empty") {
    val r = Seq("a b c d", "a b", "a", "").toDF("text")
      .select(Repetition.wordNgrams(Clean.splitWs($"text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1).isEmpty && r(2).isEmpty)
  }

  test("repetitionStats: boilerplate doc scores high, varied doc low") {
    val docs = Seq(
      (0L, "buy now buy now buy now buy now buy now"),
      (1L, "the quick brown fox jumps over one lazy dog today"),
      (2L, "x")).toDF("doc_id", "text")
    val r = Repetition.repetitionStats(docs, "doc_id", "text")
      .as[(Long, String, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    // doc 0: "now buy" occurs 4x, "buy now" 5x -> top = ("buy now", 5)
    assert(r(0L)._2 == "buy now")
    assert(r(0L)._3 == 5 * 7 / 39.0)
    // every 5-gram position in doc 0 repeats (all windows of the cycle)
    assert(r(0L)._4 > 0.9)
    // doc 1 has no repeated bigram: top frac small, dup frac exactly 0
    assert(r(1L)._4 == 0.0)
    assert(r(1L)._3 < 0.3)
    // single-token doc: defaults
    assert(r(2L) == ((2L, "", 0.0, 0.0)))
  }

  test("repetitionStats tie-break: equal counts pick greatest gram") {
    val docs = Seq((0L, "a b a b")).toDF("doc_id", "text")
    // bigrams: "a b"(2), "b a"(1) -> top is "a b" by count;
    val docs2 = Seq((1L, "z y x w")).toDF("doc_id", "text")
    // all bigrams count 1 -> lexicographically greatest wins
    val r = Repetition.repetitionStats(docs, "doc_id", "text")
      .as[(Long, String, Double, Double)].head()
    assert(r._2 == "a b")
    val r2 = Repetition.repetitionStats(docs2, "doc_id", "text")
      .as[(Long, String, Double, Double)].head()
    assert(r2._2 == "z y")
  }
}
