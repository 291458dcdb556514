package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** f16 pins: the map-HOF contracts the query relies on. */
class MapHofSpec extends SparkSpec {
  import spark.implicits._

  test("map_from_arrays throws on duplicate keys — array_distinct is load-bearing") {
    val dup = Seq(1).toDF("x").select(
      map_from_arrays(array(lit("a"), lit("a")), array(lit(1), lit(2))))
    val e = intercept[Exception](dup.collect())
    assert(e.getMessage.contains("DUPLICATED_MAP_KEY"), e.getMessage)
  }

  test("map_zip_with joins by KEY, not position; one-sided keys get null") {
    val r = Seq(1).toDF("x").select(
      map_zip_with(
        map_from_arrays(array(lit("a"), lit("b")), array(lit(1), lit(2))),
        // reversed key order + an extra key on the right side
        map_from_arrays(array(lit("b"), lit("a"), lit("c")),
          array(lit(20), lit(10), lit(30))),
        (_, l, rr) => coalesce(l, lit(0)) * 100 + coalesce(rr, lit(0)))
        .as("m"))
      .select(explode(col("m")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // by-key: a→1·100+10, b→2·100+20; right-only c→0·100+30
    assert(r == Map("a" -> 110, "b" -> 220, "c" -> 30))
  }

  test("f16 query: every emitted score clears the map_filter threshold") {
    val rows = graft.SparkEntry.queries("f16_hof_map")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 8L))
  }
}
