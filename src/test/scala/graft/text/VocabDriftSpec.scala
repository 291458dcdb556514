package graft.text

import graft.SparkSpec

/** Semantic gate for the JSD drift metric (exact values are gated by the
  * DuckDB oracle on llm_vocab_jsd): identity → 0, symmetry, and
  * disjoint vocabularies scoring near the ln 2 bound. */
class VocabDriftSpec extends SparkSpec {
  import spark.implicits._

  private def score(a: Seq[String], b: Seq[String]): Double =
    VocabDrift.jsd(a.toDF("text"), b.toDF("text"), "text")
      .head().getDouble(0)

  test("identical corpora have zero divergence") {
    val c = Seq("the quick brown fox", "jumps over the lazy dog")
    assert(score(c, c) == 0.0)
  }

  test("symmetric in its arguments") {
    val a = Seq("alpha beta gamma alpha", "beta beta delta")
    val b = Seq("alpha epsilon zeta", "eta theta theta")
    assert(score(a, b) == score(b, a))
  }

  test("disjoint vocabularies approach the ln 2 bound; overlap lowers it") {
    val a = Seq.fill(50)("aa bb cc dd ee")
    val b = Seq.fill(50)("vv ww xx yy zz")
    val disjoint = score(a, b)
    assert(disjoint > 0.5 && disjoint <= math.log(2) + 1e-9, s"$disjoint")
    val mixed = score(a, Seq.fill(50)("aa bb cc yy zz"))
    assert(mixed < disjoint)
  }
}
