package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.expr.Lev

/** Differential gate for the bit-parallel Levenshtein kernel: Lev.dist
  * must equal Spark's built-in (UTF8String.levenshteinDistance — the
  * value the f9 DuckDB oracle is green against) on every input, across
  * the word-size boundaries the blocked algorithm must carry over.
  */
class LevSpec extends AnyFunSuite {

  private def builtin(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  private def check(a: String, b: String): Unit =
    assert(Lev.dist(a, b) == builtin(a, b),
      s"a=${a.take(80)}(len ${a.length}) b=${b.take(80)}(len ${b.length})")

  test("edge cases: empty, equal, disjoint") {
    check("", "")
    check("", "abc")
    check("abc", "")
    check("abc", "abc")
    check("abc", "xyz")
    check("a", "b")
    check("kitten", "sitting")
    check("flaw", "lawn")
  }

  test("word-boundary pattern lengths (63..66, 127..129, 200)") {
    val rnd = new scala.util.Random(7)
    for (m <- Seq(63, 64, 65, 66, 127, 128, 129, 200)) {
      val base = Array.fill(m)(('a' + rnd.nextInt(4)).toChar).mkString
      // mutate a few positions + an insert and a delete
      val mut = base.updated(m / 3, 'z').updated(2 * m / 3, 'q')
      check(base, mut)
      check(base, mut.drop(1))
      check(base, "x" + mut)
      check(base, base.reverse)
    }
  }

  test("randomized differential (small alphabet forces dense DP)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val la = rnd.nextInt(180)
      val lb = rnd.nextInt(180)
      val a = Array.fill(la)(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Array.fill(lb)(('a' + rnd.nextInt(3)).toChar).mkString
      check(a, b)
    }
  }

  test("randomized differential (wide alphabet, long strings)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 40) {
      val la = 200 + rnd.nextInt(900)
      val lb = 200 + rnd.nextInt(900)
      val a = Array.fill(la)(('a' + rnd.nextInt(26)).toChar).mkString
      val b = Array.fill(lb)(('a' + rnd.nextInt(26)).toChar).mkString
      check(a, b)
    }
  }

  test("unicode: non-ASCII BMP and surrogate pairs count as one symbol") {
    check("café", "cafe")
    check("héllo wörld", "hello world")
    // U+1F600 is a surrogate pair in UTF-16 but ONE edit symbol
    val smile = new String(Character.toChars(0x1F600))
    check(s"a${smile}b", "ab")
    check(s"a${smile}b", s"a${smile}b")
    check(smile * 3, smile * 5)
    check(s"$smile abc", "xabc")
  }

  test("shared prefix/suffix trimming is exact-preserving") {
    val pre = "commonprefix" * 10
    val suf = "commonsuffix" * 10
    check(pre + "abc" + suf, pre + "axc" + suf)
    check(pre + suf, pre + "x" + suf)
    check(pre, pre + suf)
  }
}
