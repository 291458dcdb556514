package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned join (SPARK-37375) surface: the same
  * deterministic synth grid as [[SynthSource]], but the table REPORTS
  * its layout — every input partition carries one `part` key value
  * ([[HasPartitionKey]]) and the scan declares
  * `KeyGroupedPartitioning(identity(part))` — so a join between two
  * such tables on the partition key plans with ZERO shuffle of either
  * side under `spark.sql.sources.v2.bucketing.enabled`. This is S10's
  * bucketed-join contract delivered by the CONNECTOR instead of a
  * saved-table bucket spec: at 100 TB it's how Iceberg/Delta-style
  * sources hand Spark their clustering so recurring fact-fact joins
  * never pay the exchange.
  *
  * Rows are the SynthV2 grid plus `part = doc_id % parts`, so the
  * DuckDB twin regenerates both join sides with generate_series and
  * the whole shuffle-free plan is hash-gated end to end.
  */
class SynthPartedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthPartedV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthPartedTable(opts.getLong("numRows", 1000L),
      opts.getInt("parts", 8))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SynthPartedV2 {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("part", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** Test/plan-audit visibility: how many partitions the most recent
    * planInputPartitions actually planned (after any runtime prune). */
  val lastPlannedPartitions = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Extract the kept `part` values from a runtime predicate: the DPP
    * machinery pushes `part IN (v1, ...)` (or a single equality).
    * Anything unrecognized yields None — the scan then plans ALL
    * partitions, which is always correct (pruning is an optimization,
    * never a filter the source may half-apply). */
  private[v2] def inSetOnPart(p: Predicate): Option[Seq[Long]] = {
    def isPartRef(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("part"))
      case _ => false
    }
    def longOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Long] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value match {
          case n: java.lang.Number => Some(n.longValue())
          case _ => None
        }
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && isPartRef(p.children()(0)) =>
        val vals = p.children().drop(1).map(longOf)
        if (vals.forall(_.isDefined)) Some(vals.flatten.toSeq) else None
      case "=" if p.children().length == 2 && isPartRef(p.children()(0)) =>
        longOf(p.children()(1)).map(Seq(_))
      case _ => None
    }
  }
}

class SynthPartedTable(numRows: Long, parts: Int)
    extends Table with SupportsRead {
  require(numRows >= 0, s"numRows must be nonnegative, got $numRows")
  require(parts > 0, s"parts must be positive, got $parts")
  override def name(): String = s"graft_synth_parted($numRows,$parts)"
  override def schema(): StructType = SynthPartedV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthPartedScanBuilder(numRows, parts)
}

class SynthPartedScanBuilder(numRows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthPartedV2.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SynthPartedScan(numRows, parts, required)
}

class SynthPartedScan(numRows: Long, parts: Int, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeV2Filtering {
  // runtime (DPP) restriction on the partition key — None until Spark
  // pushes a join-derived filter at execution time
  private var keep: Option[Set[Long]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynthPartedScan parts=$parts cols=${required.fieldNames.mkString(",")}"

  /** The report that makes SPJ possible: rows are clustered by the
    * identity of `part`, one key value per input partition. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("part")), parts)

  /** Runtime filtering (the DSv2 face of dynamic partition pruning):
    * `part` is the attribute Spark may derive a runtime IN-set for from
    * the other side of a join; partitions outside the set are never
    * planned — the connector analogue of hive-dir DPP. */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("part"))

  override def filter(predicates: Array[Predicate]): Unit =
    // the predicate array is a CONJUNCTION: every recognized predicate
    // is its own constraint and they intersect — including the empty
    // IN-set an empty dim side produces, which must prune to ZERO
    // partitions (the strongest prune), never fall through as
    // "no constraint". Unrecognized predicates contribute nothing.
    predicates.flatMap(SynthPartedV2.inSetOnPart).foreach { vs =>
      val s = vs.toSet
      keep = Some(keep.fold(s)(_ intersect s))
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val planned = (0 until parts)
      .filter(p => keep.forall(_.contains(p.toLong)))
      .map(p => SynthPartedPartition(p, numRows, parts): InputPartition)
      .toArray
    SynthPartedV2.lastPlannedPartitions.set(planned.length)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthPartedReaderFactory(required)
}

/** One partition per key value; partitionKey() is what Spark matches
  * across the two join sides to co-locate tasks without an exchange. */
case class SynthPartedPartition(part: Int, numRows: Long, parts: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(part.toLong)
}

class SynthPartedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SynthPartedPartition]
    new PartitionReader[InternalRow] {
      // ids congruent to `part` mod `parts`, ascending
      private var id = part.part.toLong - part.parts
      override def next(): Boolean = { id += part.parts; id < part.numRows }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "doc_id" => id: java.lang.Long
          case "part" => (id % part.parts): java.lang.Long
          case "lang" => UTF8String.fromString(SynthV2.langOf(id))
          case "n_chars" => SynthV2.nCharsOf(id): java.lang.Long
        }
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
