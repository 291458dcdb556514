package graft.sources.v2

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 at scale: a DataSource V2 `TableProvider` for the paginated REST
  * JSON protocol (`…?page=N` over a `{"count", "next", "results":[…]}`
  * envelope — the reference's fetch_issues.py:29-39 pager).
  *
  * The driver-side [[graft.sources.Sources.paginatedJson]] walks the
  * `next` links sequentially, so ingest time is pages × RTT no matter
  * how many executors the cluster has. This source turns the same
  * protocol into a planned scan:
  *
  *  - **Parallel page fetch on executors.** One driver probe of page 0
  *    reads the envelope's `count`; with the caller's `pageSize` that
  *    fixes the page index space up front, so pages are dealt into
  *    `pagesPerTask`-sized [[InputPartition]]s and fetched concurrently
  *    by every executor — ingest time drops from pages × RTT to
  *    (pages / parallelism) × RTT. (`count` can also be passed as an
  *    option to skip the probe.)
  *  - **Column pruning into the parser.** The pruned schema is handed to
  *    the catalyst `JacksonParser`, which token-skips every field the
  *    query never references — unparsed, not parsed-then-dropped.
  *  - **Limit pushdown into the page plan.** A query LIMIT caps the
  *    planned pages at ⌈limit/pageSize⌉, so `df.limit(10)` against a
  *    million-page API fetches ONE page. Reported partially-pushed, so
  *    Spark keeps its own exact limit on top.
  *  - **Filter pushdown into query params.** Equality predicates on
  *    columns the API declares filterable (option `filterParams`)
  *    become query params, so the SERVER shrinks the result set and the
  *    scan re-probes the filtered `count` — a 1% selective filter plans
  *    (and transfers) 1% of the pages. The network-volume analogue of
  *    parquet predicate pushdown.
  *
  * HTTP is plain `java.net` with bounded retry; any reachable base URL
  * works, which is what makes the executor-side fetch real on a cluster
  * (the option string travels with the plan). Offline tests and the
  * registered query run against the in-JVM [[RestFixture]] server.
  */
class RestSource extends TableProvider {
  // page-0 body cached across inferSchema → getTable (Spark calls both
  // on the same provider instance when the schema is omitted): one
  // driver round-trip serves both the record sample and the count field
  @volatile private var page0: (String, String) = _
  private def probeBody(url: String): String = {
    val cached = page0
    if (cached != null && cached._1 == url) cached._2
    else {
      val body = RestHttp.get(RestV2.pageUrl(url, 0))
      page0 = (url, body)
      body
    }
  }
  private def requiredUrl(opts: CaseInsensitiveStringMap): String =
    Option(opts.get("url")).getOrElse(
      throw new IllegalArgumentException("RestSource requires option 'url'"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // one driver-side probe of page 0, schema inferred from its records;
    // production callers pass an explicit schema and skip this entirely
    val records = RestV2.resultStrings(probeBody(requiredUrl(options)))
    val spark = SparkSession.active
    import spark.implicits._
    spark.read.json(spark.createDataset(records)).schema
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val url = requiredUrl(opts)
    val pageSize = opts.getInt("pageSize", 0)
    require(pageSize > 0, s"RestSource requires option 'pageSize' > 0, got $pageSize")
    // -1 = unknown: resolved by a probe when (and only when) a READ scan
    // is built — table resolution itself must not GET, or df.write
    // against a write-only endpoint (POST-only sink) could never resolve
    val count =
      if (opts.containsKey("count")) {
        val c = opts.getLong("count", 0L)
        require(c >= 0, s"count must be nonnegative, got $c")
        c
      } else -1L
    // `filterParams`: comma-list of columns the API filters server-side
    // (equality via query param) — a capability declaration, like the
    // DRF filterset the reference's API exposes. Lower-cased: every
    // surrounding layer (options, column resolution) is case-insensitive,
    // and a silent case mismatch would disable the pushdown the user
    // explicitly asked for
    val filterable = Option(opts.get("filterParams")).toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    new RestTable(url, schema, count, pageSize,
      opts.getInt("pagesPerTask", 8), filterable)
  }
}

object RestV2 {
  def pageUrl(base: String, page: Long): String =
    base + (if (base.contains("?")) "&" else "?") + s"page=$page"

  /** Plan-description suffix for pushed params — one renderer for BOTH
    * scan types so the plan-audit markers can't drift apart. */
  def renderParams(params: Seq[(String, String)]): String =
    if (params.isEmpty) ""
    else s" params=${params.map { case (k, v) => s"$k=$v" }.mkString("&")}"

  /** Base URL + server-side filter params (URL-encoded). */
  def withParams(base: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) base
    else {
      def enc(s: String) =
        java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      base + (if (base.contains("?")) "&" else "?") +
        params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    }

  private val mapper = new ObjectMapper

  /** The envelope's total record count (the DRF-style `{"count": N, …}`
    * convention the reference's API serves). Servers without it must pass
    * `count` as an option or fall back to the sequential driver pager. */
  def countFromEnvelope(body: String): Long = {
    val c = mapper.readTree(body).get("count")
    require(c != null && c.canConvertToLong,
      s"page 0 envelope has no integral 'count' field; pass option(\"count\", n) " +
        "or use the sequential driver pager for next-link-only APIs")
    c.asLong
  }

  /** Envelope → raw JSON strings of the `results` elements (inference
    * probe only; the hot path parses the envelope in one pass). */
  def resultStrings(body: String): Seq[String] = {
    val rs = mapper.readTree(body).get("results")
    if (rs == null || !rs.isArray) Seq.empty
    else (0 until rs.size).map(i => mapper.writeValueAsString(rs.get(i)))
  }

  /** Planning-time pushdown check: every record of the probe's page-0
    * `results` must satisfy the pushed equality params (JsonNode.asText
    * renders strings, integrals and booleans the same way the params
    * were rendered from the filter literals). */
  def verifyEnvelopeResults(body: String, params: Seq[(String, String)],
                            url: String): Unit = {
    if (params.isEmpty) return
    val rs = mapper.readTree(body).get("results")
    if (rs == null || !rs.isArray) return
    (0 until rs.size).foreach { i =>
      val rec = rs.get(i)
      params.foreach { case (k, v) =>
        val got = if (rec == null || rec.isNull) null else rec.get(k)
        if (got == null || got.isNull || got.asText != v)
          throw new java.io.IOException(
            s"server ignored pushed filter $k=$v (probe page 0 of $url, " +
              s"got ${if (got == null || got.isNull) "null" else got.asText}) — " +
              "the API does not honor this query param; remove it from filterParams")
      }
    }
  }
}

class RestTable(url: String, schema0: StructType, count: Long,
                pageSize: Int, pagesPerTask: Int, filterable: Set[String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(pagesPerTask > 0, s"pagesPerTask must be positive, got $pagesPerTask")
  override def name(): String = s"graft_rest($url)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(url, schema0, count, pageSize, pagesPerTask, filterable)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new RestWriteBuilder(url, info.schema(), pageSize)
}

class RestScanBuilder(url: String, full: StructType, count: Long,
                      pageSize: Int, pagesPerTask: Int,
                      filterable: Set[String] = Set.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var limit: Int = -1
  private var pushed: Array[Filter] = Array.empty
  private var params: Seq[(String, String)] = Nil
  private var countStarPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // partially pushed: we fetch only ⌈limit/pageSize⌉ pages but the last
  // fetched page can overshoot, so Spark must keep its exact limit on top
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  /** Server-side filtering: an equality predicate on a column the API
    * declares filterable (option `filterParams`) becomes a query param,
    * so the SERVER shrinks the result set — the pages its filtered
    * `count` spans are the only ones planned or fetched. This is the
    * network-volume analogue of parquet predicate pushdown: a 1%
    * selective filter means 1% of the pages cross the wire. Accepted
    * filters are exact (the server applies the same equality), so Spark
    * drops them from the post-scan plan; anything else is rejected and
    * evaluated by Spark as usual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def paramValue(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        Some(n.asInstanceOf[java.lang.Number].longValue.toString)
      case b: java.lang.Boolean => Some(b.toString)
      case _ => None // fractional/temporal: string-rendering is not exact
    }
    // top-level columns only: the reader verifies pushed params by
    // ordinal in the parse schema, and a dotted nested path declared in
    // filterParams would have no top-level field to resolve against
    val topLevel = full.fieldNames.map(_.toLowerCase).toSet
    val (eqs, rest) = filters.partition {
      case EqualTo(col, v)
          if filterable(col.toLowerCase) && topLevel(col.toLowerCase) =>
        paramValue(v) match {
          case Some(s) => params :+= (col, s); true
          case None => false
        }
      case _ => false
    }
    // Spark pairs every EqualTo with an IsNotNull on the same column; a
    // server equality match implies non-null, so the IsNotNull is
    // subsumed by the pushed param. Absorbing it matters: a leftover
    // Filter node above the scan blocks complete COUNT(*) pushdown.
    val eqCols = eqs.collect { case EqualTo(c, _) => c }.toSet
    val (subsumed, rejected) = rest.partition {
      case IsNotNull(c) => eqCols(c)
      case _ => false
    }
    pushed = eqs ++ subsumed
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) — with any already-pushed filters — is answered entirely
    * by the envelope's `count` field: the same number the page plan is
    * derived from, read from the single page-0 probe. "How many records
    * match state=new" against a million-page API is ONE request, zero
    * data pages. Only the complete, ungrouped form is accepted; grouped
    * or partial aggregation falls back to the normal scan. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar] && limit < 0
  override def pushAggregation(agg: Aggregation): Boolean = {
    // partial pushdown (returning buffer rows per partition) is never
    // cheaper here than the scan itself — accept only the complete form
    countStarPushed = supportCompletePushDown(agg)
    countStarPushed
  }

  override def build(): Scan = {
    // the filtered result set has its own count — re-probe page 0 WITH
    // the params so the page plan covers exactly the filtered pages.
    // ONE probe per build, whichever branch needs it:
    //  - pushed COUNT(*): always fresh (the pushed form fetches no data
    //    pages, so the per-page cross-check that catches a stale user
    //    `count` option never runs — the probe is the truth, and its one
    //    request is the whole cost of the pushed query)
    //  - filtered data scan: the filtered count
    val effUrl = RestV2.withParams(url, params)
    def freshBody = RestHttp.get(RestV2.pageUrl(effUrl, 0))
    if (countStarPushed) {
      // the pushed COUNT(*) never fetches data pages, so the reader's
      // per-row verification can't defend it — verify the probe's OWN
      // page-0 results against the params before trusting its count
      // (a lenient server that ignored the param shows unfiltered rows
      // right there in the probe body)
      val body = freshBody
      RestV2.verifyEnvelopeResults(body, params, effUrl)
      new RestCountScan(RestV2.countFromEnvelope(body), params)
    } else new RestScan(effUrl, full, required,
      // probe when filtered (the filtered set has its own count) or when
      // the table-level count is unknown (no 'count' option — table
      // resolution never probes, so writes can target POST-only sinks)
      if (params.isEmpty && count >= 0) count
      else RestV2.countFromEnvelope(freshBody),
      pageSize, pagesPerTask, limit, params)
  }
}

/** The completely-pushed COUNT(*): one partition, one row, zero fetches
  * beyond the planning probe that produced `count`. */
class RestCountScan(count: Long, params: Seq[(String, String)])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count_star", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRestCountScan count=$count" + RestV2.renderParams(params)
  override def planInputPartitions(): Array[InputPartition] =
    Array(RestCountPartition(count))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val n = p.asInstanceOf[RestCountPartition].count
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted
          override def get(): InternalRow = {
            emitted = true
            new GenericInternalRow(Array[Any](n))
          }
          override def close(): Unit = ()
        }
      }
    }
}

case class RestCountPartition(count: Long) extends InputPartition

class RestScan(url: String, full: StructType, required: StructType,
               count: Long, pageSize: Int, pagesPerTask: Int, limit: Int,
               params: Seq[(String, String)] = Nil)
    extends Scan with Batch {

  private val totalPages: Long = (count + pageSize - 1) / pageSize
  /** Pages actually planned: the pushed limit truncates the index space. */
  val plannedPages: Long =
    if (limit < 0) totalPages
    else math.min(totalPages, (limit.toLong + pageSize - 1) / pageSize)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRestScan pages=[0,$plannedPages) cols=${required.fieldNames.mkString(",")}" +
      (if (limit >= 0) s" limit=$limit" else "") + RestV2.renderParams(params)

  override def planInputPartitions(): Array[InputPartition] = {
    if (plannedPages == 0) return Array.empty
    (0L until plannedPages by pagesPerTask.toLong).map { s =>
      RestPartition(url, s, math.min(s + pagesPerTask, plannedPages),
        count): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(full, required, params)

  /** S1's streaming form: the same pager tailed INCREMENTALLY — offsets
    * are record counts (the envelope's `count` over an append-only API),
    * so each micro-batch plans exactly the pages its new record range
    * spans and restarts resume from the checkpointed count. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RestMicroBatchStream(url, full, required, pageSize, pagesPerTask, params)
}

case class RestPartition(url: String, startPage: Long, endPage: Long,
                         plannedCount: Long) extends InputPartition

/** A page range restricted to the global record index range [recLo,
  * recHi) — the micro-batch unit (record index = page × pageSize +
  * position, stable because the API is append-only). */
case class RestRangePartition(url: String, startPage: Long, endPage: Long,
                              recLo: Long, recHi: Long, pageSize: Int)
    extends InputPartition

class RestReaderFactory(full: StructType, required: StructType,
                        params: Seq[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case part: RestPartition =>
        new RestPartitionReader(part.url, part.startPage, part.endPage,
          full, required, params, plannedCount = Some(part.plannedCount))
      case part: RestRangePartition =>
        // no plannedCount check: the live count GROWS between offset
        // capture and page fetch on a tailed API — the record-range slice
        // is what pins batch contents instead
        new RestPartitionReader(part.url, part.startPage, part.endPage,
          full, required, params,
          recRange = Some((part.recLo, part.recHi, part.pageSize)))
    }
}

/** Record-count offset of the REST stream (envelope `count`). */
case class RestOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

class RestMicroBatchStream(url: String, full: StructType,
                           required: StructType, pageSize: Int,
                           pagesPerTask: Int, params: Seq[(String, String)])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = RestOffset(0L)
  override def latestOffset(): Offset =
    RestOffset(RestV2.countFromEnvelope(RestHttp.get(RestV2.pageUrl(url, 0))))
  override def deserializeOffset(json: String): Offset =
    RestOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[RestOffset].n
    val hi = end.asInstanceOf[RestOffset].n
    if (hi <= lo) return Array.empty
    val startPage = lo / pageSize
    val endPage = (hi + pageSize - 1) / pageSize
    (startPage until endPage by pagesPerTask.toLong).map { s =>
      RestRangePartition(url, s, math.min(s + pagesPerTask, endPage),
        lo, hi, pageSize): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(full, required, params)
}

/** Executor-side reader: fetches its page range one GET at a time and
  * parses each envelope in a single catalyst-Jackson pass — the pruned
  * element struct rides inside a one-field `results: array<...>` schema,
  * so fields outside `required` are token-skipped, never materialized.
  *
  * Pushed-filter verification: Spark drops a pushed equality from its
  * post-scan plan, so a server that silently IGNORES the query param
  * (lenient APIs drop unknown params rather than 400ing) would return
  * unfiltered rows as if they matched. The reader therefore parses the
  * pushed-filter columns too (even when pruned from `required`) and
  * fails loudly on the first row violating a pushed equality — the cost
  * is one extra parsed field per pushed filter, never a wrong answer. */
class RestPartitionReader(url: String, startPage: Long, endPage: Long,
                          full: StructType, required: StructType,
                          params: Seq[(String, String)] = Nil,
                          plannedCount: Option[Long] = None,
                          recRange: Option[(Long, Long, Int)] = None)
    extends PartitionReader[InternalRow] {

  // pushed-filter columns not already in the required schema get parsed
  // APPENDED so required ordinals are unchanged and emit can just slice
  private val extra: Seq[StructField] = {
    val have = required.fieldNames.map(_.toLowerCase).toSet
    val want = params.map(_._1).distinct.filterNot(c => have(c.toLowerCase))
    want.flatMap(c => full.fields.find(_.name.equalsIgnoreCase(c)))
  }
  // a fully-pruned schema (count(*)) still needs the element COUNT, so
  // parse one cheap field and emit empty rows
  private val element: StructType =
    if (required.isEmpty && extra.isEmpty) StructType(full.take(1))
    else StructType(required.fields ++ extra)
  private val emitEmpty = required.isEmpty
  private val project = !emitEmpty && extra.nonEmpty
  private val emptyRow = new GenericInternalRow(0) // immutable; shared

  // (ordinal, allocation-free typed comparator, "col=v" for the error) —
  // expected values pre-converted once so the per-row check never builds
  // a java String on the hot path
  private val checks: Array[(Int, InternalRow => Boolean, String)] =
    params.toArray.map { case (c, v) =>
      val ord = element.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      val cmp: InternalRow => Boolean = element.fields(ord).dataType match {
        case StringType =>
          val exp = UTF8String.fromString(v); r => r.getUTF8String(ord) == exp
        case LongType => val exp = v.toLong; r => r.getLong(ord) == exp
        case IntegerType => val exp = v.toInt; r => r.getInt(ord) == exp
        case ShortType => val exp = v.toShort; r => r.getShort(ord) == exp
        case ByteType => val exp = v.toByte; r => r.getByte(ord) == exp
        case BooleanType => val exp = v.toBoolean; r => r.getBoolean(ord) == exp
        case other => r => String.valueOf(r.get(ord, other)) == v
      }
      (ord, cmp, s"${element.fieldNames(ord)}=$v")
    }
  private def filterViolation(what: String, got: String): Nothing =
    throw new java.io.IOException(
      s"server ignored pushed filter $what (got $got, page ${page - 1} of " +
        s"$url) — the API does not honor this query param; remove it " +
        "from filterParams")
  private def verify(row: InternalRow): Unit = checks.foreach {
    case (ord, cmp, what) =>
      if (row.isNullAt(ord)) filterViolation(what, "null")
      else if (!cmp(row))
        filterViolation(what,
          String.valueOf(row.get(ord, element.fields(ord).dataType)))
  }
  // the envelope count rides along so every page cross-checks the page
  // plan — a stale user-supplied `count` fails loudly instead of
  // silently truncating the table
  private val envelope = StructType(Seq(
    StructField("results", ArrayType(element), nullable = true),
    StructField("count", LongType, nullable = true)))
  private val parser = new JacksonParser(envelope,
    new JSONOptions(Map.empty[String, String], "UTC"),
    allowArrayAsStructs = false)

  private var page = startPage
  private var rows: Array[InternalRow] = Array.empty
  private var i = -1

  private def emitNull(): InternalRow =
    if (emitEmpty) emptyRow else new GenericInternalRow(required.size)
  private def emit(r: InternalRow): InternalRow =
    if (emitEmpty) emptyRow
    else if (project) {
      // slice off the verification-only columns (appended, so required
      // ordinals are 0..required.size-1 unchanged)
      val vals = new Array[Any](required.size)
      var k = 0
      while (k < required.size) {
        vals(k) = r.get(k, required.fields(k).dataType); k += 1
      }
      new GenericInternalRow(vals)
    } else r

  private def fetchNextPage(): Boolean = {
    while (page < endPage) {
      val body = RestHttp.get(RestV2.pageUrl(url, page))
      page += 1
      val parsed = parser.parse[String](body, CreateJacksonParser.string,
        UTF8String.fromString).toArray
      val buf = parsed.flatMap { env =>
        plannedCount.foreach { pc =>
          if (!env.isNullAt(1) && env.getLong(1) != pc)
            throw new java.io.IOException(
              s"envelope count ${env.getLong(1)} != planned count $pc " +
                s"(page ${page - 1} of $url) — " +
                "the 'count' option is stale; drop it to re-probe at planning")
        }
        // streaming: the committed batch end must still be covered — a
        // server that shrank (or published count ahead of the rows)
        // would otherwise SILENTLY lose records past its short-served
        // page, and the next batch starts beyond them forever
        recRange.foreach { case (_, hi, _) =>
          if (!env.isNullAt(1) && env.getLong(1) < hi)
            throw new java.io.IOException(
              s"envelope count ${env.getLong(1)} < batch end $hi " +
                s"(page ${page - 1} of $url) — the append-only contract is " +
                "violated (count shrank or was published before its rows)")
        }
        if (env.isNullAt(0)) Array.empty[InternalRow]
        else {
          val arr = env.getArray(0)
          // streaming slice: global record index = page × pageSize +
          // position; only the batch's [recLo, recHi) range is emitted
          // (verification still runs on every fetched element)
          val pageBase =
            recRange.map { case (_, _, ps) => (page - 1) * ps }.getOrElse(0L)
          def inRange(j: Int): Boolean = recRange.forall { case (lo, hi, _) =>
            val g = pageBase + j; g >= lo && g < hi
          }
          val out = Array.newBuilder[InternalRow]
          var j = 0
          while (j < arr.numElements()) {
            if (arr.isNullAt(j)) {
              // a null element can't satisfy any pushed equality — letting
              // it through as an all-null row would be the silent-wrong-row
              // hole the verification exists to close
              if (checks.nonEmpty)
                filterViolation(checks(0)._3, "null result element")
              if (inRange(j)) out += emitNull()
            } else {
              val r = arr.getStruct(j, element.size)
              verify(r)
              if (inRange(j)) out += emit(r)
            }
            j += 1
          }
          out.result()
        }
      }
      if (buf.nonEmpty) { rows = buf; i = 0; return true }
    }
    false
  }

  override def next(): Boolean = {
    if (i >= 0 && i < rows.length) return true
    i = -1
    fetchNextPage()
  }
  override def get(): InternalRow = { val r = rows(i); i += 1; r }
  override def close(): Unit = ()
}

/** Minimal bounded-retry HTTP GET (java.net only — no extra deps). */
object RestHttp {
  /** A definitive non-200 answer — 4xx never succeeds on retry. */
  final class HttpStatusException(val code: Int, url: String)
      extends java.io.IOException(s"HTTP $code from $url")

  // one retry policy for both verbs — bounded attempts, exponential
  // backoff, 4xx fail-fast (the server answered; 5xx/transport are the
  // transient class retry exists for)
  private def withRetry(verb: String, url: String, attempts: Int)
                       (once: => String): String = {
    var last: Throwable = null
    var backoffMs = 200L
    for (a <- 1 to attempts) {
      try {
        return once
      } catch {
        case e: HttpStatusException if e.code < 500 => throw e
        case e: java.io.IOException =>
          last = e
          if (a < attempts) { Thread.sleep(backoffMs); backoffMs *= 2 }
      }
    }
    throw new java.io.IOException(s"$verb $url failed after $attempts attempts", last)
  }

  def get(url: String, attempts: Int = 3): String =
    withRetry("GET", url, attempts)(requestOnce(url, None))

  /** POST with the same retry policy as [[get]]. Safe to retry BECAUSE
    * the sink protocol is idempotent: staging replays overwrite the same
    * key, commit/abort replays skip already-moved keys. */
  def postJson(url: String, body: String, attempts: Int = 3): String =
    withRetry("POST", url, attempts)(requestOnce(url, Some(body)))

  private def requestOnce(url: String, post: Option[String]): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    post.foreach { body =>
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val out = conn.getOutputStream
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    try {
      val code = conn.getResponseCode
      if (code != 200) throw new HttpStatusException(code, url)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }
}
