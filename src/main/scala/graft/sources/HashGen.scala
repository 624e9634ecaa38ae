package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-corpus generator as a DataSource V2 table
  * (C207) — the "dsdgen as a first-class source" shape every benchmark
  * and soak harness needs: `spark.read.format(classOf[HashGen].getName)
  * .option("rows", n).option("partitions", p).load()` yields
  * `(id BIGINT, doc STRING, lang STRING)` with doc = md5(id) and lang a
  * 5-way id-derived pick — reproducible anywhere, including by a DuckDB
  * oracle, with zero files and zero shuffles.
  *
  * What makes it an ENGINE row rather than a generator script:
  *  - SupportsPushDownRequiredColumns: unselected columns are never
  *    generated (a doc-free projection never computes md5) — the DSv2
  *    column-pruning contract, observable in the scan's readSchema.
  *  - SupportsPushDownFilters: id range predicates (>, >=, <, <=, =)
  *    narrow the generated [lo, hi) interval BEFORE planning, so
  *    partitions outside the range are never even created — the DSv2
  *    predicate-pushdown contract (remaining filters are re-evaluated by
  *    Spark; pushed ones are reported in explain's PushedFilters).
  *  - planInputPartitions splits [lo, hi) evenly across `partitions`
  *    reader tasks — the source scales out like any file scan.
  */
class HashGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HashGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HashGenTable(opts.getLong("rows", 1000L), opts.getInt("partitions", 4))
  }
}

object HashGen {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  val Langs: Array[String] = Array("aa", "bb", "cc", "dd", "ee")

  /** The generator formula — shared with tests; the DuckDB oracle states
    * the same expressions over range(). */
  def doc(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(String.valueOf(id).getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }
  def lang(id: Long): String = Langs(((id % 5) + 5).toInt % 5)
}

private[sources] class HashGenTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"hashgen($rows)"
  override def schema(): StructType = HashGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HashGenScanBuilder(rows, partitions,
      options.getLong("rowsPerBatch", 100L))
}

private[sources] class HashGenScanBuilder(rows: Long, partitions: Int,
                                          rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = HashGen.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new HashGenScan(lo, hi, partitions, required, rowsPerBatch)
}

private[sources] class HashGenScan(lo: Long, hi: Long, partitions: Int,
                                   required: StructType,
                                   rowsPerBatch: Long = 100L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"hashgen range [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) return Array.empty
    val p = math.max(1, math.min(partitions.toLong, n).toInt)
    (0 until p).map { i =>
      val a = lo + n * i / p
      val b = lo + n * (i + 1) / p
      HashGenPartition(a, b): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HashGenReaderFactory(required)

  /** The STREAMING face of the same table (C212): the generator as a
    * rate-limited MicroBatchStream — offsets are plain row ids, each
    * micro-batch covers [start, min(start + rowsPerBatch, hi)), and the
    * per-batch partition planning / reader factory are shared with the
    * batch scan, so the two faces cannot drift. Restart semantics come
    * free: offsets serialize as the row id, so a checkpointed query
    * resumes exactly where the last committed batch ended. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new HashGenMicroBatchStream(lo, hi, partitions, required, rowsPerBatch)
}

private[sources] case class HashGenOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private[sources] class HashGenMicroBatchStream(lo: Long, hi: Long,
    partitions: Int, required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = HashGenOffset(lo)

  // admission control is the honest rate-limit contract: the engine asks
  // "given this start offset and this limit, how far may the next batch
  // go" — so Trigger.AvailableNow (which snapshots ONE target offset and
  // then drains toward it in limit-sized batches) still respects the cap
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[HashGenOffset].pos
    limit match {
      case mr: ReadMaxRows => HashGenOffset(math.min(hi, s + mr.maxRows))
      case _ => HashGenOffset(hi)
    }
  }
  // the un-limited horizon of this finite generator is simply its end
  override def latestOffset(): Offset = HashGenOffset(hi)
  override def reportLatestOffset(): Offset = HashGenOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def deserializeOffset(json: String): Offset =
    HashGenOffset(java.lang.Long.parseLong(json))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[HashGenOffset].pos
    val b = end.asInstanceOf[HashGenOffset].pos
    val n = math.max(0L, b - a)
    if (n == 0L) return Array.empty
    val p = math.max(1, math.min(partitions.toLong, n).toInt)
    (0 until p).map { i =>
      HashGenPartition(a + n * i / p, a + n * (i + 1) / p): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HashGenReaderFactory(required)
}

private[sources] case class HashGenPartition(from: Long, until: Long)
    extends InputPartition

private[sources] class HashGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val HashGenPartition(from, until) = partition
    // pre-resolve which fields to generate: pruned columns cost nothing
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = from - 1
      override def next(): Boolean = { cur += 1; cur < until }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id" => cur.asInstanceOf[Any]
          case "doc" => UTF8String.fromString(HashGen.doc(cur))
          case "lang" => UTF8String.fromString(HashGen.lang(cur))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
