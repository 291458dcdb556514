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
    // side-product, not a second pass. (On a session CLONE: observe()
    // registers at call time and poisons the session — see below.)
    val clone = spark.newSession()
    val cloneEvents = clone.implicits
      .localSeqToDatasetHolder(Seq((1L, Option(2.0))))
      .toDF("user_id", "value")
    val obs = org.apache.spark.sql.Observation("obs_spec_plan")
    val observed = cloneEvents.observe(obs, count(lit(1)).as("n"))
    val analyzed = observed.queryExecution.analyzed.toString
    assert(analyzed.contains("CollectMetrics"), analyzed)
    val executed = observed.queryExecution.executedPlan.toString
    assert(executed.linesIterator.count(_.contains("Scan")) <= 1,
      s"one source scan expected:\n$executed")
  }

  private def javaSerializable(o: AnyRef): Boolean =
    try {
      val oos = new java.io.ObjectOutputStream(
        new java.io.ByteArrayOutputStream())
      oos.writeObject(o); true
    } catch { case _: java.io.NotSerializableException => false }

  test("observe quarantine: the shared session stays serializable") {
    import spark.implicits._
    // the upstream poison, measured on a throwaway clone: one observe()
    // and the session never Java-serializes again (ObservationManager
    // keeps the entry past get() and is not Serializable) — this is
    // what broke ml-model scoring closures until the quarantine
    val victim = spark.newSession()
    assert(javaSerializable(victim))
    val obs = org.apache.spark.sql.Observation("obs_spec_poison")
    victim.implicits.localSeqToDatasetHolder(Seq(1L))
      .toDF("x").observe(obs, count(lit(1))).collect()
    assert(!javaSerializable(victim), "upstream fixed? drop the quarantine")

    // the quarantined operator leaves the CALLER's session clean —
    // model-scoring closures that capture the session keep working
    val events = Seq((1L, Option(2.0)), (2L, None)).toDF("user_id", "value")
    assert(javaSerializable(spark))
    Relational.observedIngestStats(events).collect()
    assert(javaSerializable(spark),
      "observedIngestStats leaked an Observation into the shared session")
  }
}
