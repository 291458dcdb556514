package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sql_recursive_spine pins: WITH RECURSIVE semantics (Spark 4.1
  * UnionLoop) — anchor+step evaluation, the zero-fill contract, and
  * the recursion-depth guard that keeps a runaway step from looping
  * the driver forever.
  */
class RecursiveCteSpec extends SparkSpec {

  test("spine enumerates every day once; missing days zero-fill") {
    val df = graft.SparkEntry.queries("sql_recursive_spine")(spark, sfDir)
    val rows = df.collect()
    // contiguous daily spine: n days == (max-min)+1, all distinct
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.distinct.length == days.length)
    assert(java.time.temporal.ChronoUnit.DAYS.between(
      days.min(Ordering[java.time.LocalDate]),
      days.max(Ordering[java.time.LocalDate])) + 1 == days.length)
    // the sparse filter leaves genuine gaps — zero-filled, not dropped
    assert(rows.exists(_.getLong(1) == 0L))
    // totals preserved: sum over the spine == plain filtered count
    val total = rows.map(_.getLong(1)).sum
    val expect = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_type") === "purchase" && col("value") > 300)
      .count()
    assert(total == expect)
  }

  test("runaway recursion hits the level limit, not an infinite loop") {
    val e = intercept[Exception] {
      spark.sql(
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r) " +
          "SELECT count(*) FROM r").collect()
    }
    assert(e.getMessage.contains("RECURSION_LEVEL_LIMIT_EXCEEDED") ||
      e.getMessage.toLowerCase.contains("recursion"), e.getMessage)
  }
}
