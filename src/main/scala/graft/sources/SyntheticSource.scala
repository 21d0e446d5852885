package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 table of deterministic synthetic events — the
  * load-generator source for stress and soak runs, and the repo's
  * demonstration of SOURCE-side scan optimization: column pruning
  * (unrequested fields are never generated) and partition pruning
  * (`event_id` range predicates drop whole input partitions at planning
  * time, the DSv2 analog of parquet row-group/partition skipping).
  *
  * The generator is pure integer modular arithmetic on the row id — no
  * JVM hashing — so an external engine can reproduce the table exactly
  * from a `range(N)`: the registry query q_synthetic_source hash-checks
  * this source against DuckDB replaying the same formulas.
  *
  * Schema and formulas (id = 0 .. rows-1):
  *   event_id   = id
  *   ts_epoch   = 1704067200 + id
  *   user_id    = id % 1000
  *   event_type = 'type' || (id % 5)
  *   cents      = (id * 2654435761) % 1000000        (Knuth multiplicative)
  *
  * Usage:
  *   spark.read.format("graft-synthetic")
  *     .option("rows", "1000000").option("partitions", "32").load()
  */
object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_epoch", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** Input partitions planned by the most recent scan — observable proof
    * that range predicates pruned at PLANNING time (asserted in spec). */
  val lastPlannedPartitions = new AtomicInteger(-1)

  /** Columns the most recent scan actually generated — observable proof
    * that projection pruning reached the source (asserted in spec). */
  val lastReadColumns = new java.util.concurrent.atomic.AtomicReference[String]("")

  private[sources] def gen(field: String, id: Long): Any = field match {
    case "event_id"   => id
    case "ts_epoch"   => 1704067200L + id
    case "user_id"    => id % 1000L
    case "event_type" => UTF8String.fromString("type" + (id % 5L))
    case "cents"      => (id * 2654435761L) % 1000000L
  }
}

class SyntheticSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synthetic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyntheticTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
}

private[sources] class SyntheticTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

private[sources] class SyntheticScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = SyntheticSource.schema
  private var lo = 0L          // inclusive event_id bound
  private var hi = Long.MaxValue // exclusive
  private var pushed = Array.empty[Filter]

  /** Accept event_id range predicates for PRUNING but return every
    * filter as residual — Spark re-applies them post-scan, so pruning
    * can only skip work, never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating +1: v + 1 on Long.MaxValue wraps NEGATIVE and would
    // silently prune every partition — the one way pruning could change
    // results
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val accepted = filters.filter {
      case GreaterThan("event_id", v: Long)        => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("event_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("event_id", v: Long)    => hi = math.min(hi, succ(v)); true
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    pushed = accepted
    filters // all residual: correctness never depends on the source
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SyntheticScan(rows, parts, lo, math.min(hi, rows), required)
}

private[sources] case class SyntheticRange(start: Long, end: Long)
  extends InputPartition

private[sources] class SyntheticScan(rows: Long, parts: Int, lo: Long,
    hi: Long, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic rows=$rows bounds=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    val planned = (0L until rows by per)
      .map(s => SyntheticRange(s, math.min(s + per, rows)))
      // partition pruning: a range wholly outside [lo, hi) never runs
      .filter(r => r.end > lo && r.start < hi)
      .toArray[InputPartition]
    SyntheticSource.lastPlannedPartitions.set(planned.length)
    SyntheticSource.lastReadColumns.set(required.fieldNames.mkString(","))
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[SyntheticRange]
        new PartitionReader[InternalRow] {
          private var id = r.start - 1
          override def next(): Boolean = { id += 1; id < r.end }
          override def get(): InternalRow =
            InternalRow.fromSeq(fields.toIndexedSeq.map(f =>
              SyntheticSource.gen(f, id)))
          override def close(): Unit = ()
        }
      }
    }
  }
}
