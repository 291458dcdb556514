package graft.sources

import graft.SparkSpec
import graft.sources.v2.{RestFixture, RestPartition, RestScan, RestScanBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The REST DSv2 source against the in-JVM fixture server: row parity
  * with the deterministic grid, parallel page planning, column pruning
  * into the parser, and limit pushdown proven by the server's per-page
  * hit counters (pages NOT fetched, not just rows not returned). */
class RestV2Spec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "id BIGINT, state STRING, prio BIGINT, title STRING")

  private def read(fx: RestFixture.Fixture, pagesPerTask: Int = 3,
                   withSchema: Boolean = true): DataFrame = {
    val r = spark.read.format("graft.sources.v2.RestSource")
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("pagesPerTask", pagesPerTask)
    (if (withSchema) r.schema(schema) else r).load()
  }

  test("end-to-end row parity with the deterministic grid") {
    val fx = RestFixture(437L, 50) // 9 pages, last one ragged
    val got = read(fx).orderBy("id")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(got.size == 437)
    assert(got.map(_._1) == (0L until 437L))
    assert(got.forall { case (i, st, pr, ti) =>
      st == RestFixture.States((i % 4).toInt) &&
        pr == (i * 7) % 5 && ti == s"issue-$i"
    })
  }

  test("schema inference probes page 0 and matches the explicit schema") {
    val df = read(RestFixture(437L, 50), withSchema = false)
    assert(df.schema.fieldNames.sorted.toSeq == Seq("id", "prio", "state", "title"))
    assert(df.count() == 437)
  }

  test("count probe reads the envelope when the option is absent") {
    // read() never passes count — the table planned 437 rows purely from
    // the driver probe of page 0; a wrong count would change the page
    // plan and the row total (collect, not count(): count() is answered
    // by the pushed count scan and never fetches the data pages)
    val fx = RestFixture(437L, 50)
    fx.resetHits()
    assert(read(fx).select("id").collect().length == 437)
    // the probe itself hits page 0 once more than the scan does; all 9
    // pages were fetched for the full row set
    assert(fx.pagesTouched == (0L until 9L).toSet)
  }

  test("pages are dealt into pagesPerTask-sized parallel partitions") {
    val b = new RestScanBuilder("http://unused", schema,
      count = 437L, pageSize = 50, pagesPerTask = 4)
    val parts = b.build().asInstanceOf[RestScan]
      .planInputPartitions().map(_.asInstanceOf[RestPartition])
    assert(parts.map(p => (p.startPage, p.endPage)).toSeq ==
      Seq((0L, 4L), (4L, 8L), (8L, 9L)))
  }

  test("column pruning reaches the parser") {
    val df = read(RestFixture(437L, 50)).select("state", "prio")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=state,prio"), plan)
    assert(df.distinct().count() == 4 * 5)
  }

  test("limit pushdown truncates the PAGE plan — unneeded pages never fetched") {
    val fx = RestFixture(100000L, 100) // 1000 pages
    fx.resetHits()
    val got = read(fx).select("id").limit(7).collect()
    assert(got.length == 7) // Spark's exact limit stays on top
    // 7 rows need ⌈7/100⌉ = 1 page; the other 999 were never requested
    assert(fx.pagesTouched == Set(0L))
  }

  test("fully-pruned schema still counts every record (non-pushable agg)") {
    // sum(lit(1)) references no columns but is NOT CountStar, so it runs
    // through the normal scan with an EMPTY required schema — the
    // empty-row reader path count(*) no longer exercises now that it is
    // answered by the pushed count scan
    val fx = RestFixture(437L, 50)
    val df = read(fx).agg(sum(lit(1L)).as("n"))
    assert(!df.queryExecution.executedPlan.toString.contains("GraftRestCountScan"))
    assert(df.as[Long].head() == 437L)
  }

  test("count(*) is answered by the envelope alone — zero data pages") {
    val fx = RestFixture(100000L, 100) // 1000 pages
    fx.resetHits()
    val df = read(fx).groupBy().count()
    assert(df.as[Long].head() == 100000L)
    assert(df.queryExecution.executedPlan.toString.contains("GraftRestCountScan"))
    assert(fx.pagesTouched == Set(0L)) // the planning probe; no data pages
  }

  test("filtered count(*) composes: one probe answers count + filter") {
    val fx = RestFixture(5000L, 50)
    val df = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("filterParams", "state").load()
      .filter(col("state") === "new").groupBy().count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftRestCountScan") && plan.contains("params=state=new"),
      plan)
    // the execution itself costs exactly ONE request: build()'s fresh
    // filtered probe (each new QueryExecution re-plans, so the hit
    // counter is reset after the plan inspection above) — a duplicate
    // probe would hide if only the SET of pages were checked
    fx.resetHits()
    assert(df.as[Long].head() == 1250L)
    assert(fx.pagesTouched == Set(0L))
    assert(fx.hitsFor(0L) == 1, fx.hitsFor(0L))
  }

  test("pushed count(*) ignores a stale count option — the probe is the truth") {
    val fx = RestFixture(437L, 50)
    val n = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("count", 200L).load().groupBy().count().as[Long].head()
    assert(n == 437L) // fresh envelope probe, not the option
  }

  test("pushed count(*) against a filter-ignoring server fails loudly too") {
    // the pushed count fetches no data pages, so the reader's per-row
    // verification can't defend it — the build-time probe must check its
    // own page-0 results against the params before trusting the count
    val fx = RestFixture(437L, 50, lenient = true)
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.v2.RestSource").schema(schema)
        .option("url", fx.url).option("pageSize", fx.pageSize)
        .option("filterParams", "state").load()
        .filter(col("state") === "new").groupBy().count().as[Long].head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("server ignored pushed filter state=new")),
      messages(ex).mkString(" | "))
  }

  test("grouped count is NOT pushed — the normal scan serves it") {
    val fx = RestFixture(437L, 50)
    val df = read(fx).groupBy("state").count()
    assert(!df.queryExecution.executedPlan.toString.contains("GraftRestCountScan"))
    assert(df.count() == 4)
  }

  test("declared equality filter is pushed as a query param — server shrinks the pages") {
    val fx = RestFixture(5000L, 50) // unfiltered: 100 pages
    fx.resetHits()
    val df = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("filterParams", "state").load()
      .filter(col("state") === "new")
    val rows = df.select("id").as[Long].collect().sorted
    // state == "new" is i % 4 == 2 on the grid: 1250 records, 25 pages
    assert(rows.toSeq == (0L until 5000L).filter(_ % 4 == 2))
    assert(fx.pagesTouched == (0L until 25L).toSet) // never the other 75
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("params=state=new"), plan)
    assert(plan.contains("pages=[0,25)"), plan)
    // verification's no-projection branch: the filtered column kept in
    // the required schema, every row server-matched
    val kept = df.select("id", "state").collect()
    assert(kept.length == 1250 && kept.forall(_.getString(1) == "new"))
  }

  test("undeclared column's filter stays Spark-side") {
    val fx = RestFixture(437L, 50)
    val df = read(fx).filter(col("prio") === 3L) // filterParams not set
    assert(df.count() == (0L until 437L).count(i => (i * 7) % 5 == 3))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("params="), plan) // nothing pushed to the server
  }

  test("pushed filter and pushed limit compose on the filtered page plan") {
    val fx = RestFixture(5000L, 50)
    fx.resetHits()
    val got = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("filterParams", "state").load()
      .filter(col("state") === "new").select("id").limit(5).collect()
    assert(got.length == 5)
    assert(fx.pagesTouched == Set(0L)) // one filtered page serves the limit
  }

  test("zero-match pushed filter plans zero partitions") {
    // collect, not count(): count() routes to the pushed count scan and
    // would never build the zero-partition data scan this test pins
    val fx = RestFixture(437L, 50)
    val df = spark.read.format("graft.sources.v2.RestSource").schema(schema)
      .option("url", fx.url).option("pageSize", fx.pageSize)
      .option("filterParams", "state").load()
      .filter(col("state") === "no_such_state").select("id")
    assert(df.collect().isEmpty)
    assert(df.queryExecution.executedPlan.toString.contains("pages=[0,0)"))
  }

  test("a server that IGNORES the filter param fails loudly — never wrong rows") {
    // the lenient fixture accepts ?state=new and serves the unfiltered
    // grid anyway (real APIs drop unknown params); Spark has dropped the
    // pushed equality from its plan, so only the reader's verification
    // stands between this and silently unfiltered results
    val fx = RestFixture(437L, 50, lenient = true)
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.v2.RestSource").schema(schema)
        .option("url", fx.url).option("pageSize", fx.pageSize)
        .option("filterParams", "state").load()
        .filter(col("state") === "new").select("id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("server ignored pushed filter state=new")),
      messages(ex).mkString(" | "))
  }

  test("stale count option fails loudly instead of silently truncating") {
    val fx = RestFixture(437L, 50)
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.v2.RestSource").schema(schema)
        .option("url", fx.url).option("pageSize", fx.pageSize)
        .option("count", 200L) // yesterday's number; the API now has 437
        .load().select("id").collect() // data pages carry the cross-check
    }
    // every page's envelope carries the true count; the reader
    // cross-checks it against the page plan
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("envelope count 437 != planned count 200")),
      messages(ex).mkString(" | "))
  }

  test("4xx is definitive: no retry burn on a page past the end") {
    val fx = RestFixture(437L, 50) // 9 pages; page 99 is a 404
    fx.resetHits()
    val ex = intercept[graft.sources.v2.RestHttp.HttpStatusException] {
      graft.sources.v2.RestHttp.get(
        graft.sources.v2.RestV2.pageUrl(fx.url, 99))
    }
    assert(ex.code == 404)
    assert(fx.hitsFor(99) == 1) // answered definitively on attempt 1
  }

  test("empty table plans zero partitions") {
    val b = new RestScanBuilder("http://unused", schema,
      count = 0L, pageSize = 50, pagesPerTask = 4)
    assert(b.build().asInstanceOf[RestScan].planInputPartitions().isEmpty)
  }
}
