package graft.sources.v2

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Offline stand-in for the reference's paginated issue API: an in-JVM
  * `com.sun.net.httpserver.HttpServer` serving the DRF-style envelope
  * `{"count": N, "next": url|null, "results": [...]}` at
  * `…/api/issues?page=N` (0-based). Everything [[RestSource]] touches —
  * sockets, envelope, pagination math — is exercised for real; only the
  * remote host is local.
  *
  * Records are a deterministic pure function of the record index, so the
  * registered query is hash-gated by a DuckDB `generate_series` twin that
  * regenerates the same rows from scratch (the SynthV2 pattern): record i
  * is `{"id": i, "state": states[i%4], "prio": (i*7)%5,
  * "title": "issue-" + i}`.
  *
  * Per-page hit counters let specs assert FETCH behavior, not just row
  * content — limit pushdown is proven by "only page 0 was requested",
  * which no result-set check could show.
  */
object RestFixture {
  val States: Array[String] = Array("closed", "in_progress", "new", "resolved")

  def recordJson(i: Long): String =
    s"""{"id":$i,"state":"${States((i % 4).toInt)}","prio":${(i * 7) % 5},"title":"issue-$i"}"""

  def pageJson(baseUrl: String, count: Long, pageSize: Int, page: Long): String = {
    val lo = page * pageSize
    val hi = math.min(lo + pageSize, count)
    val results = (lo until hi).map(recordJson).mkString(",")
    val next =
      if (hi < count) "\"" + RestV2.pageUrl(baseUrl, page + 1) + "\"" else "null"
    s"""{"count":$count,"next":$next,"results":[$results]}"""
  }

  /** The filtered variant: `ids` are the records matching the request's
    * filter params; `count` is THEIR total (what a DRF filterset serves). */
  def pageJsonIds(baseUrl: String, ids: Seq[Long], pageSize: Int,
                  page: Long): String = {
    val lo = (page * pageSize).toInt
    val hi = math.min(lo + pageSize, ids.size)
    val results = ids.slice(lo, hi).map(recordJson).mkString(",")
    val next =
      if (hi < ids.size) "\"" + RestV2.pageUrl(baseUrl, page + 1) + "\"" else "null"
    s"""{"count":${ids.size},"next":$next,"results":[$results]}"""
  }

  /** Does record `i` match an equality filter param? Mirrors
    * [[recordJson]]'s grid field by field; an unknown field is a client
    * error the handler answers 400 to (a real filterset rejects it). */
  private[v2] def fieldMatches(i: Long, field: String, v: String): Option[Boolean] =
    field match {
      case "state" => Some(States((i % 4).toInt) == v)
      case "prio"  => Some(((i * 7) % 5).toString == v)
      case "id"    => Some(i.toString == v)
      case "title" => Some(s"issue-$i" == v)
      case _       => None
    }

  /** One fixture = one grid at a path of its own on the shared server.
    * `apply` fixtures are memoized by (count, pageSize, latencyMs,
    * lenient) and IMMUTABLE; [[growable]] fixtures live at a unique path
    * and may append records. `url` is the base to hand to RestSource.
    * `latencyMs` sleeps before each response — the WAN RTT knob that makes
    * the sequential-vs-parallel ingest comparison honest on localhost. */
  final class Fixture(val url: String, initialCount: Long, val pageSize: Int,
                      val latencyMs: Long = 0L,
                      growableFixture: Boolean = false) {
    private val cur = new AtomicLong(initialCount)
    def count: Long = cur.get
    /** Append records — the tailed-API semantic the MicroBatchStream
      * assumes (append-only, index-stable). Only fixtures registered via
      * [[RestFixture.growable]] may grow: the memoized `apply` fixtures
      * are shared across suites under their INITIAL-count key, and a
      * mutated shared grid would poison every later same-key caller. */
    def grow(extra: Long): Unit = {
      require(growableFixture,
        "grow() is only valid on RestFixture.growable(...) fixtures — " +
          "apply() fixtures are memoized by initial count and shared")
      require(extra >= 0, s"grow must be nonnegative, got $extra")
      cur.addAndGet(extra)
    }
    private[RestFixture] val hits = new ConcurrentHashMap[Long, AtomicLong]()
    // matching ids memoized per filter set: an O(count) rescan per page
    // request would bleed CPU into any latency-sensitive timing run.
    // Keyed by the (k,v) pairs AND the live count: a joined-string key
    // would collide when a decoded value contains '&' or '=', and a
    // count-free key could permanently cache a pre-grow id list (a
    // handler racing grow() would re-insert the stale view after any
    // clear)
    private[RestFixture] val idCache =
      new ConcurrentHashMap[(Seq[(String, String)], Long), Seq[Long]]()
    def hitsFor(page: Long): Long =
      Option(hits.get(page)).map(_.get).getOrElse(0L)
    def pagesTouched: Set[Long] = {
      import scala.jdk.CollectionConverters._
      hits.keySet.asScala.toSet
    }
    def resetHits(): Unit = hits.clear()
  }

  private val fixtures =
    new ConcurrentHashMap[(Long, Int, Long, Boolean), Fixture]()
  @volatile private var server: HttpServer = _

  private def ensureServer(): HttpServer = synchronized {
    if (server == null) {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      // daemon threads everywhere: the fixture must never keep a driver
      // JVM alive after its main exits (Verify/Bench/One all create the
      // server). The handler pool gets an explicit daemon factory; the
      // JDK dispatcher thread inherits daemon status from the STARTING
      // thread, so start() runs on a short-lived daemon thread.
      // cached (not fixed-8) pool: a real API answers concurrent callers
      // concurrently; a small fixed pool would cap the measured client
      // parallelism at the FIXTURE's width instead of the scan's
      s.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => { val t = new Thread(r, "rest-fixture"); t.setDaemon(true); t }))
      val starter = new Thread(() => s.start(), "rest-fixture-start")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      Runtime.getRuntime.addShutdownHook(new Thread(() => s.stop(0)))
      server = s
    }
    server
  }

  /** Lazily start (once per JVM) and register a grid at
    * `/api/issues/{count}_{pageSize}_{latencyMs}[_lenient]`; memoized per
    * key. `lenient = true` builds the MISBEHAVING api: filter params are
    * accepted but silently ignored (many real APIs drop unknown query
    * params instead of 400ing) — the fixture for proving the reader's
    * pushed-filter verification fails loudly instead of returning
    * unfiltered rows as if they matched. */
  def apply(count: Long, pageSize: Int, latencyMs: Long = 0L,
            lenient: Boolean = false): Fixture =
    fixtures.computeIfAbsent((count, pageSize, latencyMs, lenient),
      { case (c, ps, lat, len) =>
        register(s"/api/issues/${c}_${ps}_$lat" + (if (len) "_lenient" else ""),
          c, ps, lat, len, growableFixture = false)
      })

  private val growableSeq = new AtomicLong(0L)

  /** Write-side fixture: a REST SINK with two-phase semantics — POST
    * `/staging` holds batches under their idempotency key, POST
    * `/commit` atomically publishes the listed keys, POST `/abort`
    * discards them. GET serves the PUBLISHED records back through the
    * standard paginated envelope, so a write→read roundtrip runs the
    * whole pipe over real sockets. Unique path per call (sinks
    * accumulate state; sharing one across runs would cross-pollute). */
  final class Sink(val url: String, val pageSize: Int) {
    private[RestFixture] val staged =
      new ConcurrentHashMap[String, com.fasterxml.jackson.databind.JsonNode]()
    // plain ArrayList under the Sink lock: commit appends whole batches
    // (addAll), and a copy-on-write list would make an n-record publish
    // O(n²) array copies
    private[RestFixture] val published =
      new java.util.ArrayList[com.fasterxml.jackson.databind.JsonNode]()
    private[RestFixture] def publishedSnapshot
        : Array[com.fasterxml.jackson.databind.JsonNode] =
      synchronized(published.toArray(
        new Array[com.fasterxml.jackson.databind.JsonNode](published.size)))
    // append-only log of every batch ever staged (key → record count):
    // lets specs pin the BATCHING behavior, which published totals can't
    private[RestFixture] val stagedLog = new ConcurrentHashMap[String, Int]()
    // job tags whose staging scope was aborted: a /staging that races
    // past its job's /abort (task succeeded after the job failed, or the
    // HTTP requests reordered) must be dropped, not resurrected — the
    // tombstone makes "aborted scope is empty" final
    private[RestFixture] val abortedPrefixes =
      ConcurrentHashMap.newKeySet[String]()
    def stagedKeys: Set[String] = {
      import scala.jdk.CollectionConverters._
      staged.keySet.asScala.toSet
    }
    def stagedBatchSizes: Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      stagedLog.asScala.toMap
    }
    def publishedCount: Int = synchronized(published.size)
    /** Clear all state so a memoized sink can serve repeated runs
      * without accumulating (one server context per JVM, not per run). */
    def reset(): Unit = synchronized {
      staged.clear(); stagedLog.clear(); published.clear()
      abortedPrefixes.clear()
    }
  }

  private val sinkSeq = new AtomicLong(0L)
  private val sinkMapper = new com.fasterxml.jackson.databind.ObjectMapper

  def sink(pageSize: Int): Sink = {
    val s = ensureServer()
    val path = s"/api/sink/${sinkSeq.incrementAndGet()}"
    val base = s"http://127.0.0.1:${s.getAddress.getPort}$path"
    val sk = new Sink(base, pageSize)
    s.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        def respond(code: Int, body: String): Unit = {
          val b = body.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
          if (b.nonEmpty) ex.getResponseBody.write(b)
          ex.close()
        }
        val sub = ex.getRequestURI.getPath.stripPrefix(path)
        if (ex.getRequestMethod == "POST") {
          val node = sinkMapper.readTree(ex.getRequestBody.readAllBytes())
          sub match {
            case "/staging" =>
              val key = node.get("key").asText
              val records = node.get("records")
              // under the Sink lock so a concurrent prefix-abort's
              // sweep + tombstone and this put cannot interleave
              sk.synchronized {
                if (sk.abortedPrefixes.stream
                      .anyMatch(p => key.startsWith(p))) {
                  respond(200, """{"ok":false,"dropped":"aborted scope"}""")
                } else {
                  sk.staged.put(key, records)
                  sk.stagedLog.put(key, records.size)
                  respond(200, """{"ok":true}""")
                }
              }
            case "/commit" =>
              // atomic publish of the listed keys, idempotent on replay
              // (a missing key was already published or aborted)
              sk.synchronized {
                val ks = node.get("keys")
                (0 until ks.size).foreach { i =>
                  val staged = sk.staged.remove(ks.get(i).asText)
                  if (staged != null) {
                    val batch = new java.util.ArrayList[
                      com.fasterxml.jackson.databind.JsonNode](staged.size)
                    (0 until staged.size).foreach(j => batch.add(staged.get(j)))
                    sk.published.addAll(batch)
                  }
                }
              }
              respond(200, """{"ok":true}""")
            case "/abort" =>
              // two forms: {"keys":[...]} (task-level, exact keys) and
              // {"prefix":"j<tag>-"} (job-level, whole staging scope +
              // tombstone so late staging cannot resurrect the scope)
              sk.synchronized {
                val ks = node.get("keys")
                if (ks != null)
                  (0 until ks.size)
                    .foreach(i => sk.staged.remove(ks.get(i).asText))
                val prefix = node.get("prefix")
                if (prefix != null) {
                  val p = prefix.asText
                  sk.abortedPrefixes.add(p)
                  sk.staged.keySet.removeIf(k => k.startsWith(p))
                }
              }
              respond(200, """{"ok":true}""")
            case _ => respond(404, "")
          }
        } else { // GET: published records through the standard envelope
          val page = Option(ex.getRequestURI.getQuery).toSeq
            .flatMap(_.split("&")).collectFirst {
              case kv if kv.startsWith("page=") => kv.drop(5).toLong
            }.getOrElse(0L)
          val snap = sk.publishedSnapshot
          val ps = sk.pageSize
          val totalPages = (snap.length + ps - 1) / ps
          if (page < 0 || page >= math.max(totalPages, 1)) respond(404, "")
          else {
            val lo = (page * ps).toInt
            val hi = math.min(lo + ps, snap.length)
            val results = (lo until hi)
              .map(i => sinkMapper.writeValueAsString(snap(i))).mkString(",")
            val next = if (hi < snap.length)
              "\"" + RestV2.pageUrl(base, page + 1) + "\"" else "null"
            respond(200,
              s"""{"count":${snap.length},"next":$next,"results":[$results]}""")
          }
        }
      }
    })
    sk
  }

  /** A PRIVATE growable grid for streaming restart tests: unique path,
    * NEVER memoized or shared — grow() on a shared apply() fixture would
    * poison every later caller keyed on the initial count. */
  def growable(count: Long, pageSize: Int): Fixture =
    register(s"/api/issues/g${growableSeq.incrementAndGet()}_${count}_$pageSize",
      count, pageSize, lat = 0L, len = false, growableFixture = true)

  private def register(path: String, c: Long, ps: Int, lat: Long,
                       len: Boolean, growableFixture: Boolean): Fixture = {
      val s = ensureServer()
      val base = s"http://127.0.0.1:${s.getAddress.getPort}$path"
      val fx = new Fixture(base, c, ps, lat, growableFixture)
      s.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val kvs = Option(ex.getRequestURI.getQuery).toSeq
            .flatMap(_.split("&")).map { kv =>
              val Array(k, v) = kv.split("=", 2).padTo(2, "")
              (java.net.URLDecoder.decode(k, StandardCharsets.UTF_8),
                java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
            }
          val page = kvs.collectFirst { case ("page", v) => v.toLong }.getOrElse(0L)
          val filters = if (len) Nil else kvs.filter(_._1 != "page")
          fx.hits.computeIfAbsent(page, _ => new AtomicLong).incrementAndGet()
          if (lat > 0) Thread.sleep(lat)
          def respond(code: Int, body: Array[Byte]): Unit = {
            ex.getResponseHeaders.add("Content-Type", "application/json")
            ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
            if (body.nonEmpty) ex.getResponseBody.write(body)
            ex.close()
          }
          // live count, not the memo key's: grow() appends records
          val cNow = fx.count
          if (filters.exists { case (k, _) => fieldMatches(0, k, "").isEmpty }) {
            respond(400, Array.empty) // unknown filter field
          } else if (filters.isEmpty) {
            // unfiltered fast path: the contiguous grid, no id scan
            val totalPages = (cNow + ps - 1) / ps
            if (page < 0 || page >= math.max(totalPages, 1)) respond(404, Array.empty)
            else respond(200,
              pageJson(base, cNow, ps, page).getBytes(StandardCharsets.UTF_8))
          } else {
            val ids = fx.idCache.computeIfAbsent((filters.sorted, cNow), _ =>
              (0L until cNow).filter(i =>
                filters.forall { case (k, v) => fieldMatches(i, k, v).get }))
            val totalPages = (ids.size + ps - 1) / ps
            if (page < 0 || page >= math.max(totalPages, 1)) respond(404, Array.empty)
            else respond(200, pageJsonIds(RestV2.withParams(base, filters), ids,
              ps, page).getBytes(StandardCharsets.UTF_8))
          }
        }
      })
      fx
  }
}
