package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (C98) built directly on avro-mapred —
  * the distribution carries no spark-avro DataSource module, and Avro is
  * the remaining common wire format next to parquet/ORC/JSONL/CSV
  * (Kafka-adjacent pipelines hand batches over as Avro container files).
  *
  * Read path: `AvroKeyInputFormat` splits container files on their sync
  * markers — the same block-level parallelism parquet row groups give —
  * so one 1 TB file still fans out across executors; the schema is
  * caller-declared DDL (no inference pass over the data, the
  * json_ingest posture) and each writer-schema datum converts to a Row
  * immediately inside the map (Hadoop input formats REUSE record
  * objects; buffering raw records would alias them). Avro is a
  * row-major format: there is no column pruning or predicate pushdown
  * to claim — project/filter run post-decode, which is exactly why the
  * engine's persistent format stays parquet and Avro is ingest-only.
  *
  * Write path: Row→GenericRecord against an Avro schema derived from
  * the DataFrame schema (nullable fields become `[null, T]` unions),
  * emitted through `AvroKeyOutputFormat` — records are created inside
  * the task and flow straight to the writer (no shuffle of
  * non-serializable Avro objects); the schema travels as its JSON
  * string and re-parses lazily per partition (Avro `Schema` instances
  * don't cross the wire).
  *
  * Supported Catalyst types: LONG/INT/DOUBLE/FLOAT/BOOLEAN/STRING/
  * BINARY, STRUCT, ARRAY — the closure of the engine's ingest schemas.
  */
object Avro {

  /** Read Avro container files at `path` as a DataFrame with the given
    * DDL schema (e.g. "doc_id BIGINT, meta STRUCT<author: STRING>"). */
  def read(spark: SparkSession, path: String, ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // GENERIC data model: the default ReflectData would try to reflect
    // a runtime schema off container classes (and dies on an erased
    // type variable); we decode to GenericRecord and convert ourselves
    org.apache.avro.hadoop.io.AvroSerialization
      .setDataModelClass(conf, classOf[GenericData])
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      // convert in the same iteration step the record is handed over —
      // the input format reuses the underlying datum object
      .map { case (k, _) => toRow(k.datum(), schema) }
    spark.createDataFrame(rdd, schema)
  }

  /** Write `df` as Avro container files under `path`. */
  def write(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema, recordName)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    // GENERIC data model (see read): ReflectData chokes on ArrayList<T>'s
    // erased element type when resolving the [null, array] union
    org.apache.avro.hadoop.io.AvroSerialization
      .setDataModelClass(job.getConfiguration, classOf[GenericData])
    df.rdd.mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map(r => (new AvroKey[GenericRecord](toRecord(r, sparkSchema, schema)),
          NullWritable.get()))
      }
      .saveAsNewAPIHadoopFile(path,
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  private def toRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) => toRow(r, st)
    case (s: CharSequence, StringType) => s.toString // avro Utf8 → String
    case (l: java.lang.Long, LongType) => l
    case (i: java.lang.Integer, LongType) => i.longValue // int widening
    case (i: java.lang.Integer, IntegerType) => i
    case (d: java.lang.Double, DoubleType) => d
    case (f: java.lang.Float, FloatType) => f
    case (b: java.lang.Boolean, BooleanType) => b
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.toSeq.map(fromAvro(_, et))
    case (other, t) =>
      throw new IllegalArgumentException(
        s"unsupported avro value ${other.getClass} for catalyst type $t")
  }

  /** DataFrame schema → Avro record schema; nullable → [null, T] union. */
  private[sources] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = toAvroType(f.dataType, s"${name}_${f.name}")
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft.sources", false, fields.asJava)
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case st: StructType => toAvroSchema(st, name)
    case ArrayType(et, containsNull) =>
      val el = toAvroType(et, s"${name}_item")
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), el))
        else el)
    case other =>
      throw new IllegalArgumentException(s"unsupported catalyst type $other")
  }

  private[sources] def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(row.get(i), f.dataType,
        nonNullBranch(schema.getField(f.name).schema())))
    }
    rec
  }

  /** A [null, T] union's T branch (field schemas from [[toAvroSchema]]). */
  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => toRecord(r, st, schema)
    // collection.Seq, not the 2.13 immutable default: Spark rows carry
    // mutable.ArraySeq for array columns
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      val el = nonNullBranch(schema.getElementType)
      new java.util.ArrayList[Any](s.map(toAvro(_, et, el)).asJava)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x // primitives + String pass through
  }
}
