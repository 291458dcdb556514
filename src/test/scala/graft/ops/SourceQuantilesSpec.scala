package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Grouped A6: the approx (mergeable-sketch) per-source quartiles must
  * track the exact grouped percentile; exact is oracle-gated, this spec
  * gates the approx twin's error and both results' shape. */
class SourceQuantilesSpec extends SparkSpec {

  private def table(name: String): Map[String, (Double, Double, Double)] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("exact quartiles are ordered; approx within sketch tolerance") {
    val exact = table("llm_source_quantiles")
    val approx = table("llm_source_quantiles_approx")
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    for ((src, (a, b, c)) <- exact) {
      assert(a <= b && b <= c, s"$src quartiles out of order")
      assert(a >= 0.0 && c <= 1.0, s"$src quality out of [0,1]")
      val (x, y, z) = approx(src)
      // accuracy 10000 -> rank error <= n/10000; fixture groups are
      // small, so the sketch is near-exact — gate at a loose 0.05
      assert(math.abs(x - a) < 0.05 && math.abs(y - b) < 0.05 &&
        math.abs(z - c) < 0.05, s"$src approx drifted: $approx vs $exact")
    }
  }
}
