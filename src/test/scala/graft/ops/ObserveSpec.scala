package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The observe/CollectMetrics contract behind a18_observe: metrics are
  * accumulator side-products of the frame's ONE execution — same values
  * as the direct aggregates, no second scan of the source. */
class ObserveSpec extends SparkSpec {

  test("observed metrics equal direct aggregates; source scans once") {
    import spark.implicits._
    val events = Seq(
      (1L, Some(2.0)), (2L, None), (3L, Some(5.5)), (5L, Some(0.0)))
      .toDF("user_id", "value")

    val got = Relational.observedIngestStats(events)
      .as[(Long, Long, Long)].head()
    assert(got == ((4L, 3L, 11L)),
      "n_rows / non-null value count / uid sum from the accumulators")

    // the observed frame's plan carries the CollectMetrics node and
    // still exactly ONE scan of the source — telemetry is a
    // side-product, not a second pass
    val obs = org.apache.spark.sql.Observation("obs_spec_plan")
    val observed = events.observe(obs, count(lit(1)).as("n"))
    val analyzed = observed.queryExecution.analyzed.toString
    assert(analyzed.contains("CollectMetrics"), analyzed)
    val executed = observed.queryExecution.executedPlan.toString
    assert(executed.linesIterator.count(_.contains("Scan")) <= 1,
      s"one source scan expected:\n$executed")
  }
}
