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
    // the cleanup paths ran too: the job-level abort clears the write's
    // whole job-tagged staging scope by prefix — including batches of a
    // task that task-committed AFTER the job had already failed, whose
    // message never reaches the driver and whose task abort never runs
    // (the key-list-only form raced exactly there) — so no orphaned
    // staging is left behind in ANY completion order
    assert(sink.stagedKeys.isEmpty, sink.stagedKeys)
    // and batches WERE staged before the failure (the assert above isn't
    // vacuous): the three surviving partitions logged their staging
    assert(sink.stagedBatchSizes.nonEmpty)
  }

  test("prefix abort tombstones the scope: late staging cannot resurrect it") {
    import graft.sources.v2.RestHttp
    val sink = RestFixture.sink(pageSize = 10)
    RestHttp.postJson(s"${sink.url}/staging",
      """{"key":"jdead-p0-t1-b0","records":[{"id":1,"state":"x"}]}""")
    assert(sink.stagedKeys == Set("jdead-p0-t1-b0"))
    RestHttp.postJson(s"${sink.url}/abort", """{"prefix":"jdead-"}""")
    assert(sink.stagedKeys.isEmpty)
    // the race the tombstone closes: a task that outlives the job abort
    // stages another batch — it must be dropped, not stored
    RestHttp.postJson(s"${sink.url}/staging",
      """{"key":"jdead-p1-t2-b0","records":[{"id":2,"state":"y"}]}""")
    assert(sink.stagedKeys.isEmpty, sink.stagedKeys)
    // an unrelated job's staging is untouched by the tombstone
    RestHttp.postJson(s"${sink.url}/staging",
      """{"key":"jlive-p0-t3-b0","records":[{"id":3,"state":"z"}]}""")
    assert(sink.stagedKeys == Set("jlive-p0-t3-b0"))
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
