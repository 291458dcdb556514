package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Contracts behind llm_cms_counts: the one-sided error bound (CMS never
  * undercounts), exactness at generous width, and the merge-invariance
  * that makes the estimate hash-gateable (unlike the HLL union — see
  * SketchRollupSpec). */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(tokens: Seq[String], eps: Double): CountMinSketch = {
    val bytes = tokens.toDF("token")
      .agg(count_min_sketch(col("token"), lit(eps), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  private val stream: Seq[String] =
    (1 to 100).map(_ => "alpha") ++ (1 to 40).map(_ => "beta") ++
      (1 to 7).map(_ => "gamma") ++ Seq("delta")

  test("never undercounts, even at a collision-forcing width") {
    val cms = sketchOf(stream, eps = 0.5) // width 4: collisions certain
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size }
    exact.foreach { case (tok, n) =>
      assert(cms.estimateCount(tok) >= n.toLong,
        s"$tok: est ${cms.estimateCount(tok)} < exact $n")
    }
  }

  test("exact at generous width; absent key estimates 0") {
    val cms = sketchOf(stream, eps = 1e-4)
    assert(cms.estimateCount("alpha") == 100L)
    assert(cms.estimateCount("beta") == 40L)
    assert(cms.estimateCount("gamma") == 7L)
    assert(cms.estimateCount("delta") == 1L)
    assert(cms.estimateCount("never-seen") == 0L)
  }

  test("estimates are partitioning-invariant (merge = exact addition)") {
    def est(parts: Int): Seq[Long] = {
      val bytes = stream.toDF("token").repartition(parts)
        .agg(count_min_sketch(col("token"), lit(0.01), lit(0.99), lit(42)))
        .head().getAs[Array[Byte]](0)
      val cms = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      Seq("alpha", "beta", "gamma", "delta", "never-seen")
        .map(cms.estimateCount)
    }
    assert(est(1) == est(7))
  }
}
