package graft.sources

import graft.SparkSpec
import graft.sources.v2.RestFixture
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The REST sink's two-phase write: staged batches publish atomically on
  * job commit, a failed job publishes NOTHING (not a prefix), and a full
  * write→read roundtrip runs over real sockets through the generator/
  * parser pair. */
class RestWriteSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, state STRING")

  private def writeTo(sink: RestFixture.Sink, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.v2.RestSource")
      .option("url", sink.url).option("pageSize", sink.pageSize)
      .mode("append").save()

  test("write → read roundtrip over sockets") {
    val sink = RestFixture.sink(pageSize = 40)
    val df = (0L until 437L).map(i => (i, s"s${i % 5}"))
      .toDF("id", "state").repartition(3)
    writeTo(sink, df)
    assert(sink.publishedCount == 437)
    assert(sink.stagedKeys.isEmpty) // everything staged was committed
    // read back through the SAME paginated envelope the read path speaks
    val back = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", sink.url).option("pageSize", sink.pageSize).load()
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back == (0L until 437L).map(i => (i, s"s${i % 5}")))
  }

  test("a failed job publishes NOTHING — not a prefix") {
    val sink = RestFixture.sink(pageSize = 10)
    // three of four partitions succeed and stage their batches; the
    // poisoned row fails the last task, so job commit never fires and
    // the sink must show no partial data
    val df = spark.range(0, 100, 1, numPartitions = 4)
      .select(col("id"), when(col("id") < 99L, lit("ok"))
        .otherwise(raise_error(lit("boom"))).as("state"))
    intercept[Exception] { writeTo(sink, df) }
    assert(sink.publishedCount == 0, s"published=${sink.publishedCount}")
    // the cleanup paths ran too: successful tasks' staged batches were
    // /abort-ed by the job-level abort, the failed task's by its own —
    // no orphaned staging left behind
    assert(sink.stagedKeys.isEmpty, sink.stagedKeys)
    // and batches WERE staged before the failure (the assert above isn't
    // vacuous): the three surviving partitions logged their staging
    assert(sink.stagedBatchSizes.nonEmpty)
  }

  test("batching: rows stream out in pageSize-sized staged batches") {
    val sink = RestFixture.sink(pageSize = 25)
    writeTo(sink, (0L until 100L).toDF("id")
      .select(col("id"), lit("x").as("state")).repartition(1))
    assert(sink.publishedCount == 100)
    assert(sink.stagedKeys.isEmpty)
    // the staging LOG pins the bounded-memory behavior itself: one
    // partition's 100 rows arrived as 4 batches of 25, not one giant
    // buffer (publishedCount alone could not tell the difference)
    val sizes = sink.stagedBatchSizes
    assert(sizes.size == 4, sizes)
    assert(sizes.values.forall(_ == 25), sizes)
  }
}
