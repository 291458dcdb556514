package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen

/** UniMax waterfilling: the sequential recursion (Curation.unimaxQuotas,
  * what Spark runs) vs the closed form (what the DuckDB twin computes) —
  * property-checked equal, plus hand cases and selection invariants. */
class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  /** The SQL twin's closed form, transcribed: sorted ascending by
    * (n, source), capped prefix where n·(k−i+1)+cumprev ≤ B, uncapped
    * suffix splits the slack with the remainder to the last (B' mod m). */
  private def closedForm(counts: Seq[(String, Long)], budget: Long)
      : Seq[(String, Long, Long)] = {
    val sorted = counts.sortBy { case (s, n) => (n, s) }
    val k = sorted.size
    val cum = sorted.map(_._2).scanLeft(0L)(_ + _)
    val capped = sorted.zipWithIndex.map { case ((_, n), i0) =>
      n * (k - i0) + cum(i0) <= budget
    }
    val capsum = sorted.zip(capped).collect { case ((_, n), true) => n }.sum
    val m = capped.count(!_)
    val slack = budget - capsum
    sorted.zipWithIndex.map { case ((s, n), i0) =>
      val q =
        if (capped(i0)) n
        else slack / m + (if ((i0 + 1) > k - (slack % m)) 1L else 0L)
      (s, n, q)
    }
  }

  test("property: recursion == closed form, budget-exact, caps honored") {
    val gen = for {
      k <- Gen.choose(1, 12)
      ns <- Gen.listOfN(k, Gen.choose(0L, 40L))
      b <- Gen.choose(0L, 250L)
    } yield (ns.zipWithIndex.map { case (n, i) => (s"s$i", n) }, b)
    def sampled[A](g: Gen[A]): A =
      Iterator.continually(g.sample).flatten.next()
    for (_ <- 1 to 300) {
      val (counts, b) = sampled(gen)
      val rec = Curation.unimaxQuotas(counts, b)
      assert(rec == closedForm(counts, b), s"counts=$counts b=$b")
      val total = counts.map(_._2).sum
      assert(rec.map(_._3).sum == math.min(b, total))
      assert(rec.forall { case (_, n, q) => q >= 0 && q <= n })
      // evenness: any source below another's quota is fully taken
      val byQ = rec.map(_._3).max
      assert(rec.forall { case (_, n, q) => q == n || q >= byQ - 1 })
    }
  }

  test("hand case: capped small sources, slack waterfilled with remainder") {
    val r = Curation.unimaxQuotas(
      Seq("big" -> 100L, "mid" -> 10L, "tiny" -> 2L), budget = 20L)
    assert(r == Seq(("tiny", 2L, 2L), ("mid", 10L, 9L), ("big", 100L, 9L)))
  }

  test("hand case: budget exceeds corpus -> everything kept") {
    val r = Curation.unimaxQuotas(Seq("a" -> 3L, "b" -> 5L), budget = 100L)
    assert(r.map(t => t._1 -> t._3).toMap == Map("a" -> 3L, "b" -> 5L))
  }

  test("unimaxSample: per-source quota honored, deterministic, md5 order") {
    val df = (0L until 200L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val out = Curation.unimaxSample(df, "doc_id", "source", budget = 30)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(out.length == 30)
    // 4 uniform sources of 50: quotas 7,7,8,8 (remainder to the last two
    // in (n, source) order)
    assert(bySrc.values.toSeq.sorted == Seq(7, 7, 8, 8))
    // deterministic: second run identical
    val again = Curation.unimaxSample(df, "doc_id", "source", budget = 30)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.sortBy(identity).toSeq == again.sortBy(identity).toSeq)
    // the kept set per source is the md5-smallest quota ids
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val kept0 = out.filter(_._1 == "src0").map(_._2).toSet
    val want0 = (0L until 200L).filter(_ % 4 == 0)
      .sortBy(i => (h(i), i)).take(bySrc("src0")).toSet
    assert(kept0 == want0)
  }

  test("a NULL source fails fast with the contract, not an NPE mid-sort") {
    val df = Seq((0L, Some("a")), (1L, None), (2L, Some("b")))
      .toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Curation.unimaxQuotasDf(df, "source", 2).collect()
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("unimaxSample: zero budget and empty frame give empty results") {
    val df = (0L until 10L).map(i => (i, "s")).toDF("doc_id", "source")
    assert(Curation.unimaxSample(df, "doc_id", "source", 0).count() == 0)
    assert(Curation.unimaxSample(df.limit(0), "doc_id", "source", 5)
      .count() == 0)
  }
}
