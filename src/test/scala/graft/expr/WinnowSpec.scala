package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData

/** Gates the winnowing fingerprint kernel: the SIGMOD'03 guarantee (a
  * shared substring of length ≥ k + w − 1 forces a shared fingerprint),
  * brute-force parity of the sliding-window minimum, and the edge
  * contract (fewer than w grams → empty set, matching the SQL twin's
  * cnt = w filter).
  */
class WinnowSpec extends AnyFunSuite {

  private def fp(text: String, k: Int = 8, w: Int = 4): Set[Long] =
    Winnow.fingerprints(text, k, w) match {
      case a: ArrayData => a.toLongArray().toSet
    }

  /** Reference implementation: per-window minimum, no deque cleverness. */
  private def brute(text: String, k: Int, w: Int): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(g: String): Long = {
      md.reset()
      val d = md.digest(g.getBytes("UTF-8"))
      var v = 0L
      for (i <- 0 until 7) v = (v << 8) | (d(i) & 0xFFL)
      (v << 4) | ((d(7) & 0xF0L) >> 4)
    }
    val grams = text.sliding(k).toArray.map(h)
    if (grams.length < w) Set.empty
    else grams.sliding(w).map(_.min).toSet
  }

  test("matches the brute-force window minimum on random strings") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 100) {
      val len = rnd.nextInt(200)
      val s = Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString
      assert(fp(s) == brute(s, 8, 4), s"text=$s")
    }
  }

  test("guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val shared = "the quick brown fox jumps over it" // 33 >= 8+4-1
    for (_ <- 1 to 50) {
      def noise(n: Int) =
        Array.fill(n)(('A' + rnd.nextInt(26)).toChar).mkString
      val a = noise(rnd.nextInt(80)) + shared + noise(rnd.nextInt(80))
      val b = noise(rnd.nextInt(80)) + shared + noise(rnd.nextInt(80))
      assert(fp(a).intersect(fp(b)).nonEmpty,
        s"docs sharing a ${shared.length}-char substring must share a fingerprint")
    }
  }

  test("edge contract: fewer than w grams yields the empty set") {
    assert(fp("") == Set.empty)
    assert(fp("1234567") == Set.empty)          // shorter than k
    assert(fp("1234567890") == Set.empty)       // 3 grams < w=4
    assert(fp("12345678901").size == 1)         // exactly w grams → 1 window
  }

  private def fpKr(text: String, k: Int = 8, w: Int = 4): Set[Long] =
    Winnow.fingerprintsKr(text, k, w) match {
      case a: ArrayData => a.toLongArray().toSet
    }

  test("KR variant: brute parity, same guarantee, same edge contract") {
    def bruteKr(text: String, k: Int, w: Int): Set[Long] = {
      def h(g: String): Long =
        g.foldLeft(0L)((a, c) => a * 1000003L + c)
      val grams = text.sliding(k).toArray.map(h)
      if (grams.length < w) Set.empty
      else grams.sliding(w).map(_.min).toSet
    }
    val rnd = new scala.util.Random(123)
    for (_ <- 1 to 100) {
      val s = Array.fill(rnd.nextInt(200))(('a' + rnd.nextInt(4)).toChar).mkString
      assert(fpKr(s) == bruteKr(s, 8, 4), s"text=$s")
    }
    val shared = "the quick brown fox jumps over it"
    for (_ <- 1 to 30) {
      def noise(n: Int) =
        Array.fill(n)(('A' + rnd.nextInt(26)).toChar).mkString
      val a = noise(rnd.nextInt(60)) + shared + noise(rnd.nextInt(60))
      val b = noise(rnd.nextInt(60)) + shared + noise(rnd.nextInt(60))
      assert(fpKr(a).intersect(fpKr(b)).nonEmpty)
    }
    assert(fpKr("1234567890") == Set.empty)
    assert(fpKr("12345678901").size == 1)
  }

  test("position-shift robustness: fingerprints are content-local") {
    val doc = "error transfer failed at node alpha checksum mismatch detected"
    assert(fp("PREFIX " + doc) != fp(doc)) // sets differ at boundaries...
    // ...but overwhelmingly overlap: the shared content dominates
    val a = fp("PREFIX " + doc)
    val b = fp(doc)
    val jac = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac >= 0.5, s"expected high overlap after a shift, got $jac")
  }
}
