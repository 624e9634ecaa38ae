package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (C210): a validating sink that exercises the
  * full distributed commit protocol — per-task [[DataWriter]]s fold a
  * row count and an order-independent checksum, ship them to the driver
  * as [[WriterCommitMessage]]s, and the job-level [[BatchWrite.commit]]
  * aggregates them into a named result slot. Nothing lands on disk: the
  * point is the CONTRACT a real writer (Iceberg/Delta/JDBC) rides —
  * task-side buffering, task commit, driver-side all-or-nothing commit,
  * abort discard — testable without a warehouse.
  *
  * `option("run.id", ...)` names the result; read it back with
  * [[CountingSink.result]]. The checksum XORs a per-row hash, so it is
  * partitioning- and order-invariant — two writes of the same data match
  * regardless of parallelism.
  */
class CountingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the written frame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CountingSinkTable(schema,
      Option(properties.get("run.id")).getOrElse("default"))
}

object CountingSink {
  /** (rows, checksum) per run.id, populated at job commit. */
  private val results = new ConcurrentHashMap[String, (Long, Long)]()
  def result(runId: String): Option[(Long, Long)] = Option(results.get(runId))
  private[sources] def publish(runId: String, rows: Long, checksum: Long): Unit =
    results.put(runId, (rows, checksum))
}

private[sources] class CountingSinkTable(writeSchema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"counting_sink($runId)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite = fresh slot
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountingBatchWrite(runId)
      }
    }
}

private[sources] case class CountMessage(rows: Long, checksum: Long)
    extends WriterCommitMessage

private[sources] class CountingBatchWrite(runId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CountingWriterFactory
  // all-or-nothing: only here do the per-task results become visible
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum) = messages.foldLeft((0L, 0L)) {
      case ((r, c), CountMessage(mr, mc)) => (r + mr, c ^ mc)
      case (acc, _) => acc
    }
    CountingSink.publish(runId, rows, sum)
  }
  // a failed job discards every task's buffered result — nothing publishes
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // order-/partitioning-invariant: XOR of a per-row hash
        checksum ^= scala.util.hashing.MurmurHash3
          .stringHash(record.toString).toLong & 0xffffffffL
      }
      override def commit(): WriterCommitMessage = CountMessage(rows, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
