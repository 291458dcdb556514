package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._
  import HeavyHitters._

  private def bruteForce(stream: Seq[String], k: Int): Map[String, Long] = {
    val n = stream.size.toLong
    stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("MG guarantee: every token with freq > N/(cap+1) survives add") {
    val stream = Seq.fill(40)("hot") ++ (1 to 300).map(i => s"cold$i") ++
      Seq.fill(25)("warm")
    val s = new MgSummary(8)
    stream.foreach(s.add)
    // N=365, N/(cap+1) ≈ 40.6 -- only a bound check: hot (40) may or may
    // not survive, but its ESTIMATE can never exceed truth
    for ((t, c) <- s.counts) {
      val truth = stream.count(_ == t).toLong
      assert(c <= truth && truth - c <= stream.size / (8 + 1) + 1, t)
    }
  }

  test("MG merge preserves the combined-stream guarantee") {
    val a = Seq.fill(60)("x") ++ (1 to 100).map(i => s"a$i")
    val b = Seq.fill(45)("y") ++ (1 to 120).map(i => s"b$i")
    val sa = new MgSummary(6); a.foreach(sa.add)
    val sb = new MgSummary(6); b.foreach(sb.add)
    val m = sa.merge(sb)
    assert(m.counts.size <= 6)
    val all = a ++ b
    // x: 60 > N/(cap+1) = 325/7 ≈ 46.4 -> guaranteed present; same for y
    assert(m.counts.contains("x") && m.counts.contains("y"))
    for ((t, c) <- m.counts)
      assert(c <= all.count(_ == t).toLong)
  }

  test("property: heavyHitters == brute force over random corpora") {
    val word = Gen.frequency(
      4 -> Gen.const("the"), 2 -> Gen.const("of"),
      3 -> Gen.oneOf("a", "b", "c", "d"),
      2 -> Gen.choose(1, 500).map(i => s"w$i"))
    for (trial <- 1 to 3) {
      val docGen = Gen.listOfN(80,
        Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))))
      val docs = Iterator.continually(docGen.sample).flatten.next()
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(7)
      val k = 40
      val got = HeavyHitters.heavyHitters(df, "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = bruteForce(docs.flatMap(_.split(" ").map(_.toLowerCase)), k)
      assert(got == want, s"trial $trial")
    }
  }

  test("empty corpus and no-hitter corpus give empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitters(empty, "text", 10).count() == 0)
    // all tokens distinct -> nothing exceeds N/k for k < N
    val flat = (1 to 100).map(i => (i.toLong, s"u$i v$i"))
      .toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitters(flat, "text", 50).count() == 0)
  }
}
