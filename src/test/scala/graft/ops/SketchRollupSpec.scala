package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy and merge-invariance gates behind the a19_hll_rollup golden
  * twin: the pinned estimates are only trustworthy because (a) they sit
  * within the sketch's error bound of the EXACT counts and (b) the
  * union-merge is order/partitioning-independent. */
class SketchRollupSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(col("source"), col("text"))

  test("per-source and union estimates within 5% of exact") {
    val exactTotal = docs.select("text").distinct().count().toDouble
    val exactPerSrc = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = docs.groupBy("source")
      .agg(hll_sketch_agg(col("text"), lit(12)).as("sk"))
      .localCheckpoint(true)
    val est = sk.select(col("source"),
        hll_sketch_estimate(col("sk")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (src, e) =>
      assert(math.abs(e - exactPerSrc(src)) <= 0.05 * exactPerSrc(src) + 1,
        s"$src: est $e vs exact ${exactPerSrc(src)}")
    }
    val total = sk.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0).toDouble
    assert(math.abs(total - exactTotal) <= 0.05 * exactTotal,
      s"union: est $total vs exact $exactTotal")
  }

  test("per-source estimates are partitioning-invariant and exact here") {
    // the a19 golden contract: at this per-source cardinality the
    // sketches stay sparse (exact), so the estimate cannot move with the
    // partial-merge structure — unlike the union TOTAL below
    def perSrc(parts: Int): Map[String, Long] =
      docs.repartition(parts).groupBy("source")
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("text"), lit(12))).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc(1) == exact)
    assert(perSrc(7) == exact)
  }

  test("union-merge TOTAL stays within bounds under different merge orders") {
    // The union estimate carries NO stability guarantee across merge
    // orders: in dev at sf0.01 it measured 502 vs 504 for the same 500
    // distincts under different input partitioning (Spark's HLL union
    // promotes to HLL-mode registers whose content depends on the merge
    // trajectory) — unlike the per-source estimates, whose
    // partitioning-INVARIANCE the previous test asserts as equality.
    // Consequence (encoded in a19's design): never hash-gate a union
    // estimate; the only portable contract is the error bound, asserted
    // here for each merge order separately. Equality of a and b is
    // deliberately NOT asserted in either direction.
    def unionEst(parts: Int): Long =
      docs.repartition(parts)
        .groupBy("source").agg(hll_sketch_agg(col("text"), lit(12)).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
        .head().getLong(0)
    val (a, b) = (unionEst(1), unionEst(7))
    val exact = docs.select("text").distinct().count().toDouble
    assert(math.abs(a - exact) <= 0.05 * exact, s"union(1)=$a exact=$exact")
    assert(math.abs(b - exact) <= 0.05 * exact, s"union(7)=$b exact=$exact")
  }
}
