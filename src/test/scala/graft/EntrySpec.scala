package graft

/** The driver smoke-checks SparkEntry.entry(spark) for rows>0 — this spec
  * is the same check, run before every commit. */
class EntrySpec extends SparkSpec {
  test("entry: flagship cluster-stats pipeline returns rows on sf0.001") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.contains("cluster") && out.columns.contains("n"))
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
