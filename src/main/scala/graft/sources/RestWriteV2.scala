package graft.sources.v2

import java.io.StringWriter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{JSONOptions, JacksonGenerator}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** The write half of the REST connector: `df.write.format(...)` against
  * a two-phase sink (`POST /staging` → `POST /commit`), the standard
  * exactly-once recipe for a non-transactional endpoint:
  *
  *  - Each task streams its rows out in `batchRows`-sized staged batches
  *    under an idempotency key `j<job>-p<partition>-t<task>-b<seq>` —
  *    bounded memory per task, and a retried/speculative attempt stages
  *    under a DIFFERENT task id, so duplicates can never mix; the job
  *    tag scopes ALL of a write's staging for prefix cleanup on abort.
  *  - Spark delivers exactly ONE commit message per partition; the
  *    driver's job commit publishes exactly the keys those winning
  *    attempts staged, in one atomic `/commit`. Staged batches from lost
  *    attempts are never referenced (task abort also `/abort`s its own
  *    keys eagerly).
  *  - A job that fails BEFORE `/commit` shows NOTHING on the sink — not
  *    a prefix (RestWriteSpec pins both directions). The one unavoidable
  *    caveat of any non-transactional endpoint: if `/commit` is applied
  *    server-side but every response read is lost, Spark reports failure
  *    while the data IS published — re-running the "failed" append would
  *    then double-write (the same window a Kafka producer without
  *    transactions has; dedup on replay needs sink-side record keys).
  *
  * Rows are serialized by the catalyst `JacksonGenerator` — the exact
  * inverse of the read path's `JacksonParser`, so write→read roundtrips
  * are symmetric by construction. */
class RestWriteBuilder(url: String, schema: StructType, batchRows: Int)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new RestBatchWrite(url, schema, batchRows)
    override def description(): String = s"GraftRestWrite($url)"
  }
}

case class RestCommitMessage(keys: Seq[String], rows: Long)
    extends WriterCommitMessage

class RestBatchWrite(url: String, schema: StructType, batchRows: Int)
    extends BatchWrite {
  // job-unique staging scope: every key this write stages carries the
  // tag, so the job-level abort can clear the write's ENTIRE staging by
  // prefix. Message-listed keys alone are incomplete: a task that
  // task-commits in the window after the job has already failed never
  // delivers its message to the driver (null slot in abort()) and never
  // runs task-level abort — its staged batches would orphan forever
  // (observed as a RestWriteSpec race under local[32]).
  private val jobTag: String =
    java.util.UUID.randomUUID.toString.substring(0, 8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new RestDataWriterFactory(url, schema, batchRows, jobTag)

  private def keysOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect { case RestCommitMessage(ks, _) => ks }.flatten

  private def postKeys(endpoint: String, keys: Seq[String]): Unit =
    RestHttp.postJson(s"$url/$endpoint",
      s"""{"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}""")

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    postKeys("commit", keysOf(messages))

  // abort may receive nulls for tasks that never committed. Their own
  // task-level abort drops their staging for the usual failure orders,
  // but NOT when the task succeeded after the job had already failed —
  // so the job abort clears the write's whole staging scope by prefix
  // (and the sink tombstones the tag, so staging still in flight when
  // the abort lands cannot resurrect it).
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    RestHttp.postJson(s"$url/abort", s"""{"prefix":"j$jobTag-"}""")
}

class RestDataWriterFactory(url: String, schema: StructType, batchRows: Int,
                            jobTag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new RestDataWriter(url, schema, batchRows, jobTag, partitionId, taskId)
}

class RestDataWriter(url: String, schema: StructType, batchRows: Int,
                     jobTag: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  require(batchRows > 0, s"batchRows must be positive, got $batchRows")

  private val sw = new StringWriter
  private val gen = new JacksonGenerator(schema, sw,
    new JSONOptions(Map.empty[String, String], "UTC"))
  private val keys = scala.collection.mutable.ArrayBuffer.empty[String]
  private val batch = new StringBuilder
  private var inBatch = 0
  private var total = 0L
  private var seq = 0

  override def write(row: InternalRow): Unit = {
    sw.getBuffer.setLength(0)
    gen.write(row)
    gen.flush()
    // jackson separates sequential root values with a space — trim it
    if (inBatch > 0) batch.append(',')
    batch.append(sw.toString.trim)
    inBatch += 1
    total += 1
    if (inBatch >= batchRows) flushBatch()
  }

  private def flushBatch(): Unit = {
    if (inBatch == 0) return
    val key = s"j$jobTag-p$partitionId-t$taskId-b$seq"
    RestHttp.postJson(s"$url/staging",
      s"""{"key":"$key","records":[$batch]}""")
    keys += key
    batch.clear()
    inBatch = 0
    seq += 1
  }

  override def commit(): WriterCommitMessage = {
    flushBatch()
    RestCommitMessage(keys.toSeq, total)
  }

  override def abort(): Unit = {
    // drop what this attempt staged; unflushed rows die with the buffer
    if (keys.nonEmpty)
      RestHttp.postJson(s"$url/abort",
        s"""{"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}""")
  }

  override def close(): Unit = gen.close()
}
