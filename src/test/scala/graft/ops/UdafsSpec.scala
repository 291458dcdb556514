package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed arg-min Aggregator: deterministic representative pick with
  * partial-aggregable O(1) state (SURVEY §2.11). */
class UdafsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 5L, "v5"), ("a", 2L, "v2"), ("a", 9L, "v9"),
    ("b", 7L, "v7"), ("c", 1L, "v1")).toDF("g", "id", "v")

  test("picks the value of the smallest id per group") {
    val got = rows.groupBy("g")
      .agg(Udafs.argMinBy(col("id"), col("v")).as("rep"))
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "v2", "b" -> "v7", "c" -> "v1"))
  }

  test("partitioning-invariant (merge path equals reduce path)") {
    def rep(parts: Int): Map[String, String] =
      rows.repartition(parts).groupBy("g")
        .agg(Udafs.argMinBy(col("id"), col("v")).as("rep"))
        .as[(String, String)].collect().toMap
    assert(rep(1) == rep(5))
  }

  test("Aggregator contract: zero loses to any row, merge prefers lower id") {
    import Udafs.{ArgMinAgg, ArgMinBuf}
    assert(ArgMinAgg.reduce(ArgMinAgg.zero, (3L, "x"))
      == ArgMinBuf(3L, "x", seen = true))
    assert(ArgMinAgg.merge(ArgMinBuf(3L, "x", seen = true),
      ArgMinBuf(4L, "y", seen = true)) == ArgMinBuf(3L, "x", seen = true))
    assert(ArgMinAgg.merge(ArgMinBuf(4L, "y", seen = true),
      ArgMinBuf(3L, "x", seen = true)) == ArgMinBuf(3L, "x", seen = true))
    assert(ArgMinAgg.merge(ArgMinAgg.zero, ArgMinAgg.zero) == ArgMinAgg.zero)
  }

  test("a real row with id == Long.MaxValue is kept, not mistaken for zero") {
    import Udafs.{ArgMinAgg, ArgMinBuf}
    // an id-sentinel zero (the bug this pins) would drop this row
    assert(ArgMinAgg.reduce(ArgMinAgg.zero, (Long.MaxValue, "edge"))
      == ArgMinBuf(Long.MaxValue, "edge", seen = true))
    assert(ArgMinAgg.merge(ArgMinAgg.zero,
      ArgMinBuf(Long.MaxValue, "edge", seen = true)).v == "edge")
    val got = Seq(("g", Long.MaxValue, "edge")).toDF("g", "id", "v")
      .groupBy("g").agg(Udafs.argMinBy(col("id"), col("v")).as("rep"))
      .as[(String, String)].collect().toMap
    assert(got == Map("g" -> "edge"))
  }
}
