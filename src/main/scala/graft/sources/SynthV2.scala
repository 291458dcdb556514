package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 surface demo: a deterministic synthetic documents table
  * (`spark.read.format("graft.sources.v2.SynthSource")`) with the two
  * capabilities that matter at 100 TB implemented for real, not mocked:
  *
  *  - **Filter pushdown → partition pruning**: `doc_id` range predicates
  *    are absorbed into the scan ([[SynthScanBuilder.pushFilters]]) and
  *    narrow BOTH the generated id range and the planned input
  *    partitions — a slice whose id range misses the filter is never
  *    created, the DSv2 analogue of parquet row-group/partition skipping
  *    (SynthV2Spec pins the planned-partition count; the pushed range is
  *    printed in the scan description for plan audits).
  *  - **Column pruning**: the reader materializes only the columns the
  *    query references ([[SynthScanBuilder.pruneColumns]]).
  *
  * Row content is a pure function of doc_id on a DuckDB-re-derivable
  * grid (modular arithmetic + a fixed lang wheel), so the registered
  * query is hash-gated by a twin that regenerates the same rows with
  * `generate_series` — a real cross-engine check of the whole source.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties keep the caller's original key case — re-wrap
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(opts.getLong("numRows", 1000L),
      opts.getInt("slices", 4),
      opts.getBoolean("aggPush", true))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SynthV2 {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val Langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** The deterministic row, mirrored verbatim by the DuckDB twin. */
  def langOf(id: Long): String = Langs((id % 5).toInt)
  def nCharsOf(id: Long): Long = (id * 48271L) % 1000L
}

class SynthTable(numRows: Long, slices: Int, aggPush: Boolean = true)
    extends Table with SupportsRead {
  require(numRows >= 0, s"numRows must be nonnegative, got $numRows")
  // slices=0 would divide by zero at planning; a negative value would
  // silently plan ZERO partitions and return an empty (wrong) result
  require(slices > 0, s"slices must be positive, got $slices")
  override def name(): String = s"graft_synth($numRows)"
  override def schema(): StructType = SynthV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(numRows, slices, aggPush)
}

class SynthScanBuilder(numRows: Long, slices: Int,
                       aggPush: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  /** COMPLETE aggregate pushdown (GROUP BY included): the grid's row
    * is a pure function of doc_id with joint period 1000 (n_chars =
    * (i·48271) % 1000 depends on i % 1000; lang on i % 5; 5 | 1000),
    * so count(*) / sum(n_chars) [GROUP BY lang] over the pushed
    * [lo, hi) range is answered in O(period) DRIVER work — full cycles
    * contribute `cycles ×` one period's class totals, the remainder is
    * walked directly. No row is ever generated: the scan returns the
    * ≤5 result rows. min/max(doc_id) are closed-form too: range ends
    * globally, residue-shifted range ends per lang. The
    * index-shaped-source contract at 100 TB — metadata answers the
    * aggregate, the cluster never scans. Filters push BEFORE
    * aggregation, so the two compose ([lo,hi) is the filtered range).
    * Refused (return false → Spark keeps its own aggregate) for
    * anything but CountStar / non-distinct Sum(n_chars) /
    * Min/Max(doc_id), a non-[lang] grouping, or when disabled via the
    * `aggPush` option (the spec's off-arm). */
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
  private var pushedAgg: Option[(StructType, Array[InternalRow])] = None

  private def langRef(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: org.apache.spark.sql.connector.expressions.NamedReference =>
      r.fieldNames.sameElements(Array("lang"))
    case _ => false
  }
  private def nCharsSum(f: AggregateFunc): Boolean = f match {
    case s: Sum => !s.isDistinct && langRef2(s.column, "n_chars")
    case _ => false
  }
  private def langRef2(
      e: org.apache.spark.sql.connector.expressions.Expression,
      name: String): Boolean = e match {
    case r: org.apache.spark.sql.connector.expressions.NamedReference =>
      r.fieldNames.sameElements(Array(name))
    case _ => false
  }
  // min/max(doc_id) are closed-form: on the range ends globally, and
  // per lang via residue arithmetic — the first/last id in [lo, hi)
  // with id % 5 == c is lo/hi-1 shifted by at most 4, O(groups) driver
  // work with no walk at all
  private def docIdMin(f: AggregateFunc): Boolean = f match {
    case m: Min => langRef2(m.column, "doc_id")
    case _ => false
  }
  private def docIdMax(f: AggregateFunc): Boolean = f match {
    case m: Max => langRef2(m.column, "doc_id")
    case _ => false
  }
  private def canPush(agg: Aggregation): Boolean =
    aggPush &&
      (agg.groupByExpressions.isEmpty ||
        (agg.groupByExpressions.length == 1 &&
          langRef(agg.groupByExpressions.apply(0)))) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(f =>
        f.isInstanceOf[CountStar] || nCharsSum(f) ||
          docIdMin(f) || docIdMax(f))

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPush(agg)) return false
    val byLang = agg.groupByExpressions.nonEmpty
    // one period's per-class (lang) count and n_chars sum
    val period = 1000
    val cnt = Array.fill(5)(0L)
    val sum1 = Array.fill(5)(0L)
    def cls(i: Long): Int = (i % 5).toInt
    // full cycles: every residue of [0, period) appears `cycles` times
    val n = math.max(0L, hi - lo)
    val cycles = n / period
    if (cycles > 0) {
      var r = 0
      while (r < period) {
        val c = cls(r)
        cnt(c) += cycles
        sum1(c) += cycles * SynthV2.nCharsOf(r)
        r += 1
      }
    }
    // remainder: walk the actual ids (their residues matter)
    var i = lo + cycles * period
    while (i < hi) {
      val c = cls(i)
      cnt(c) += 1
      sum1(c) += SynthV2.nCharsOf(i)
      i += 1
    }
    // the first/last id of residue class c inside [lo, hi): shift the
    // range end to the nearest id with id % 5 == c (≤4 steps, no walk)
    def classMin(c: Int): Long = lo + (((c - lo) % 5) + 5) % 5
    def classMax(c: Int): Long = (hi - 1) - ((((hi - 1) - c) % 5) + 5) % 5
    def resultRow(c: Option[Int]): InternalRow = {
      val counts = c.fold(cnt.sum)(cnt(_))
      val sums = c.fold(sum1.sum)(sum1(_))
      val aggVals: Seq[Any] = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => counts: java.lang.Long
        case f if docIdMin(f) =>
          if (counts == 0) null
          else c.fold(lo)(classMin): java.lang.Long
        case f if docIdMax(f) =>
          if (counts == 0) null
          else c.fold(hi - 1)(classMax): java.lang.Long
        // SQL: sum/min/max over the empty set are NULL, never 0 — a
        // pushed global aggregate over a filtered-out range says so
        case _ => if (counts == 0) null else sums: java.lang.Long
      }
      val all: Seq[Any] =
        c.map(i => UTF8String.fromString(SynthV2.Langs(i)))
          .toSeq ++ aggVals
      InternalRow.fromSeq(all)
    }
    val rows =
      if (byLang) (0 until 5).filter(cnt(_) > 0)
        .map(c => resultRow(Some(c))).toArray
      else Array(resultRow(None))
    val fields =
      (if (byLang) Seq(StructField("lang", StringType, nullable = false))
       else Nil) ++
        agg.aggregateExpressions.zipWithIndex.map {
          case (_: CountStar, i) =>
            StructField(s"agg_$i", LongType, nullable = false)
          case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
        }
    pushedAgg = Some((StructType(fields), rows))
    true
  }

  private var lo = 0L
  private var hi = numRows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthV2.Schema
  // a fully-accepted LIMIT/TopN collapses the scan to one partition of
  // at most `limit` rows (slicing k rows is pointless and would break
  // the sorted-emission contract a fully-pushed TopN carries)
  private var singleSlice = false

  /** LIMIT k without ordering: ANY k rows satisfy it — the first k of
    * the (already filter-narrowed) id range do. Fully pushed: Spark
    * drops its own GlobalLimit.
    *
    * REFUSED after a complete aggregate pushdown: Spark 4.1 runs limit
    * pushdown AFTER aggregate pushdown on the same builder, and an
    * accepted limit here would (a) mutate lo/hi, corrupting the
    * already-computed agg rows' printed range, and (b) make Spark drop
    * its GlobalLimit while [[SynthAggScan]] ignores it — returning all
    * ≤5 agg rows for a `.limit(2)`. A refused limit stays in Spark's
    * plan and costs nothing on ≤5 rows. */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isDefined) return false
    hi = math.min(hi, lo + limit)
    singleSlice = true
    true
  }

  /** ORDER BY doc_id LIMIT k: the grid is generated in doc_id order,
    * so ASC top-k is the range's first k (emitted sorted) and DESC
    * top-k is its last k with the reader walking the range BACKWARD —
    * both fully pushed, Spark drops sort AND limit in either
    * direction. Any other ordering is refused and Spark keeps the
    * whole TopN. Refused after a complete aggregate pushdown for the
    * same reason as [[pushLimit]]. */
  private var descending = false
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    if (pushedAgg.isDefined) return false
    if (orders.length != 1) return false
    val o = orders(0)
    val onDocId = o.expression() match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference =>
        r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }
    if (!onDocId) return false
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (o.direction() == SortDirection.ASCENDING) {
      hi = math.min(hi, lo + limit)
    } else {
      lo = math.max(lo, hi - limit)
      descending = true
    }
    singleSlice = true
    true
  }
  override def isPartiallyPushed: Boolean = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Only exact INTEGRAL literals are absorbed — a fractional Number
    // would truncate and silently widen the accepted range, and since
    // an absorbed filter is never re-applied by Spark, any imprecision
    // here becomes a wrong ANSWER, not a missed optimization
    object L { def unapply(v: Any): Option[Long] = v match {
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        Some(n.asInstanceOf[java.lang.Number].longValue)
      case _ => None
    } }
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("doc_id", L(v)) => lo = math.max(lo, v); true
      // the strict/inclusive +1 forms reject Long.MaxValue: v+1 would
      // overflow to MinValue and plan zero partitions for a predicate
      // that matches everything
      case GreaterThan("doc_id", L(v)) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case LessThan("doc_id", L(v)) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", L(v)) if v < Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", L(v)) if v < Long.MaxValue =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some((schema, rows)) => new SynthAggScan(lo, hi, schema, rows)
    case None =>
      new SynthScan(lo, hi, if (singleSlice) 1 else slices, required,
        descending)
  }
}

/** The ≤5 pre-aggregated result rows, computed at planning time. */
class SynthAggScan(lo: Long, hi: Long, schema: StructType,
                   rows: Array[InternalRow]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynthAggScan pushedRange=[$lo,$hi) pushedAggregation=complete " +
      s"rows=${rows.length}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthAggPartition(rows.map(_.copy())))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val rs = p.asInstanceOf[SynthAggPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = rs(i)
          override def close(): Unit = ()
        }
      }
    }
}

case class SynthAggPartition(rows: Array[InternalRow])
    extends InputPartition

class SynthScan(lo: Long, hi: Long, slices: Int, required: StructType,
                descending: Boolean = false)
    extends Scan with Batch {
  // a reversed scan only exists as a fully-pushed DESC TopN, which
  // collapses to one partition — multi-slice reverse would interleave
  // the global order across splits
  require(!descending || slices == 1,
    s"descending emission requires a single slice, got $slices")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynthScan pushedRange=[$lo,$hi) " +
      s"cols=${required.fieldNames.mkString(",")}" +
      (if (descending) " order=desc" else "")

  /** Slices cover ONLY the pushed range — pruning happens at planning
    * time, so a filtered query never even creates the skipped splits. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val n = math.min(slices.toLong, hi - lo).toInt
    val step = (hi - lo) / n
    (0 until n).map { i =>
      val s = lo + i * step
      val e = if (i == n - 1) hi else s + step
      SynthPartition(s, e, descending): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

case class SynthPartition(start: Long, end: Long,
                          descending: Boolean = false)
    extends InputPartition

class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SynthPartition]
    val (first, stride) =
      if (part.descending) (part.end - 1, -1L) else (part.start, 1L)
    new PartitionReader[InternalRow] {
      private var id = first - stride
      private var remaining = math.max(0L, part.end - part.start)
      override def next(): Boolean = {
        id += stride; remaining -= 1; remaining >= 0
      }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "doc_id" => id: java.lang.Long
          case "lang" => UTF8String.fromString(SynthV2.langOf(id))
          case "n_chars" => SynthV2.nCharsOf(id): java.lang.Long
        }
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
