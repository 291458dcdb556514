package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraftSeqRatio vs ground truth captured from CPython
  * `difflib.SequenceMatcher(None, a, b).ratio()` (values generated with
  * difflib directly — incl. the autojunk cases where |b| ≥ 200). */
class SeqRatioSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, difflib ratio, int(round(100*ratio)))
  private val truth: Seq[(String, String, Double, Int)] = Seq(
    ("abcd", "badc", 0.5, 50), // transposition-heavy: levenshtein form disagrees here
    ("transfer failed", "transfre failed", 0.9333333333333333, 93),
    ("", "", 1.0, 100),
    ("", "abc", 0.0, 0),
    ("abc", "abc", 1.0, 100),
    ("kitten", "sitting", 0.6153846153846154, 62),
    ("error at line 5", "error at line 7", 0.9333333333333333, 93),
    ("the quick brown fox", "quick brown the fox", 0.7894736842105263, 79),
    ("aaaa", "aaab", 0.75, 75),
    ("ab" * 150, "ba" * 150, 0.0, 0),              // autojunk: all chars popular
    ("x" * 250, "x" * 199 + "y" * 51, 0.796, 80))  // popular-char extension

  test("kernel matches difflib bit-for-bit, incl. autojunk") {
    truth.foreach { case (a, b, r, _) =>
      assert(SeqRatio.ratio(a, b) == r, s"ratio('$a','$b')")
    }
  }

  test("fuzzRatio100 matches fuzzywuzzy's int(round(100*ratio))") {
    truth.foreach { case (a, b, _, f) =>
      assert(SeqRatio.fuzzRatio100(a, b) == f, s"fuzz100('$a','$b')")
    }
  }

  test("expression + Clean.fuzzRatioExact agree with the kernel") {
    GraftFunctions.ensureRegistered(spark)
    val df = truth.map { case (a, b, _, _) => (a, b) }.toDF("a", "b")
    val got = df.select(
        call_function("graft_seq_ratio", $"a", $"b").as("r"),
        graft.text.Clean.fuzzRatioExact($"a", $"b").as("f"))
      .as[(Double, Int)].collect()
    got.zip(truth).foreach { case ((r, f), (_, _, er, ef)) =>
      assert(r == er && f == ef)
    }
  }

  test("symmetry is NOT guaranteed (difflib is b-indexed) but null propagates") {
    GraftFunctions.ensureRegistered(spark)
    val n = Seq((Option.empty[String], Some("x"))).toDF("a", "b")
      .select(call_function("graft_seq_ratio", $"a", $"b")).head()
    assert(n.isNullAt(0))
  }
}
