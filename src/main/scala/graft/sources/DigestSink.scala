package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The write-side half of the DSv2 story: a sink that materializes
  * nothing and instead demonstrates the V2 BATCH COMMIT PROTOCOL — the
  * machinery that makes distributed writes exactly-once. Each task's
  * DataWriter folds its partition into a (row count, order-independent
  * digest) pair; `commit()` on a task produces a WriterCommitMessage; the
  * DRIVER's `BatchWrite.commit` then aggregates only the messages of
  * SUCCESSFUL task attempts — a speculative duplicate or failed attempt
  * is aborted and contributes nothing. The committed (rows, digest) is
  * published under the job's `id` option.
  *
  * The digest is an XOR over per-row field-value hashes: XOR makes it
  * independent of row order AND of how rows are split across partitions,
  * so the same data committed through any partitioning yields the same
  * digest — which is exactly the property the registry query asserts
  * (two writes of the same data through different partitionings agree).
  *
  * Usage:
  *   df.write.format("graft-digest").option("id", "job1")
  *     .mode("append").save()
  *   DigestSink.committed.get("job1")   // (rows, digest)
  */
object DigestSink {
  /** Committed results, keyed by the write's `id` option. */
  val committed = new ConcurrentHashMap[String, (Long, Long)]()

  /** Stable per-row hash: fold field-value hashes with a prime mix —
    * order-SENSITIVE across fields, order-INSENSITIVE across rows via
    * the XOR fold in the writer. */
  private[sources] def rowHash(row: InternalRow, schema: StructType): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < schema.length) {
      val v = if (row.isNullAt(i)) null else row.get(i, schema(i).dataType)
      val fh = v match {
        case null            => 0x9e3779b97f4a7c15L
        case s: UTF8String   => s.hashCode.toLong
        case l: java.lang.Long    => l.longValue()
        case d: java.lang.Double  => java.lang.Double.doubleToLongBits(d)
        case i2: java.lang.Integer => i2.longValue()
        case b: java.lang.Boolean => if (b) 1L else 2L
        case other           => other.hashCode.toLong
      }
      h = h * 31 + fh
      i += 1
    }
    h
  }
}

class DigestSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-digest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the dataframe being written
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DigestTable(schema,
      Option(properties.get("id")).getOrElse("default"))
}

private[sources] class DigestTable(writeSchema: StructType, id: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-digest($id)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsTruncate backs the advertised TRUNCATE capability (without
    // it, mode("overwrite") passes the capability check then fails at
    // write planning); truncating a sink that materializes nothing is a
    // no-op
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new DigestBatchWrite(
          info.schema(), id)
      }
    }
}

private[sources] case class DigestCommit(rows: Long, digest: Long)
  extends WriterCommitMessage

private[sources] class DigestBatchWrite(schema: StructType, id: String)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory(schema)

  /** Driver-side: only SUCCESSFUL task attempts reach here — the
    * protocol's exactly-once aggregation point. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var digest = 0L
    messages.foreach { case DigestCommit(r, d) => rows += r; digest ^= d }
    DigestSink.committed.put(id, (rows, digest))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class DigestWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var digest = 0L
      override def write(row: InternalRow): Unit = {
        rows += 1
        digest ^= DigestSink.rowHash(row, schema)
      }
      override def commit(): WriterCommitMessage = DigestCommit(rows, digest)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
