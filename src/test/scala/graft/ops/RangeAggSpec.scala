package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeAggSpec extends SparkSpec {
  import spark.implicits._

  test("prefix range-agg equals the pair-join-then-aggregate form (orders fixture)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val intervals = o.filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey".as("interval_id"),
        ($"o_totalprice" - 2000.0).as("lo"),
        ($"o_totalprice" + 2000.0).as("hi"))
    val points = o.select($"o_totalprice".as("price"))
    val got = RangeAgg.pointsInRangeAgg(points, "price",
        intervals, "interval_id", "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Relational.rangeJoinPoints(points, "price",
        intervals, "lo", "hi", binWidth = 4000.0)
      .groupBy("interval_id")
      .agg(count(lit(1)).as("cnt"),
        graft.core.Tables.dsum($"price").as("sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("prefix range-agg edge cases: boundary inclusivity, empty bands, inverted bands") {
    val points = Seq(1.0, 2.0, 2.0, 3.0, 10.0).toDF("v")
    val intervals = Seq(
      (1L, 2.0, 3.0),   // [2,3]: both boundaries inclusive -> 2,2,3
      (2L, 4.0, 9.0),   // empty band -> dropped
      (3L, 5.0, 4.0),   // inverted -> dropped
      (4L, 0.0, 100.0)  // everything
    ).toDF("id", "lo", "hi")
    val got = RangeAgg.pointsInRangeAgg(points, "v",
        intervals, "id", "lo", "hi")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L) == ((3L, 7.0)))
    assert(got(4L) == ((5L, 18.0)))
  }

  test("prefix range-agg is partitioning-invariant (exact cents sums)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val intervals = o.filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey".as("interval_id"),
        ($"o_totalprice" - 2000.0).as("lo"),
        ($"o_totalprice" + 2000.0).as("hi"))
    def run(np: Int) = {
      val pts = o.select($"o_totalprice".as("price")).repartition(np)
      RangeAgg.pointsInRangeAgg(pts, "price",
          intervals, "interval_id", "lo", "hi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    }
    assert(run(1) == run(7))
  }
}
