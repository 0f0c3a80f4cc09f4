package graft.files

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro container-file source/sink built straight on the Avro core
 * library (`spark-avro` is a separate artifact; the codec layer here is
 * the same `org.apache.avro` runtime it wraps). Avro is the row-oriented
 * sibling of parquet in every Kafka/stream-archive lake — ingest jobs
 * land `.avro` segments, analytics wants them as DataFrames.
 *
 * Scale design mirrors [[Warc]]: files are the parallelism unit (an
 * Avro container is block-compressed and self-describing, read
 * sequentially per task; ingest systems size segments for that), the
 * schema is read once on the driver from one file header, and each task
 * streams records through `DataFileStream` — peak memory per task is one
 * record, never the file. A 100 TB archive of 100k segments fans out to
 * 100k independent decode tasks with zero shuffle.
 *
 * Type mapping: boolean/int/long/float/double/string/bytes/fixed/enum,
 * nullable unions `[null, T]`, arrays, string-keyed maps, nested
 * records, plus the `date` and `timestamp-micros` logical types
 * (Spark DateType/TimestampType). Avro decimals are not mapped — read
 * them as bytes and decode explicitly.
 *
 * Reference analogue: datachain reads avro only through generic file
 * rows (src/datachain/lib/file.py); parsing is native here for the same
 * reason WARC is — at scale the format that arrives IS the format.
 */
object AvroIO {

  // ---------------------------------------------------------- avro→spark

  private def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def unionInner(s: Schema): Schema = {
    val rest = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(rest.size == 1,
      s"avro: only [null, T] unions map to a column, got $s")
    rest.head
  }

  /** Spark type of one Avro schema node (nullability handled by caller). */
  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "date") DateType else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType == null) LongType
      else s.getLogicalType.getName match {
        case "timestamp-micros" => TimestampType
        case "local-timestamp-micros" => TimestampNTZType
        case _ => LongType
      }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY =>
      val el = s.getElementType
      if (isNullableUnion(el)) ArrayType(sparkType(unionInner(el)), true)
      else ArrayType(sparkType(el), false)
    case Schema.Type.MAP =>
      val v = s.getValueType
      if (isNullableUnion(v)) MapType(StringType, sparkType(unionInner(v)), true)
      else MapType(StringType, sparkType(v), false)
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map { f =>
      val (t, nullable) =
        if (isNullableUnion(f.schema())) (sparkType(unionInner(f.schema())), true)
        else (sparkType(f.schema()), false)
      StructField(f.name(), t, nullable)
    })
    case other => throw new IllegalArgumentException(
      s"avro: unsupported type $other in $s")
  }

  /** Avro value → Spark row value, following the STRUCT type. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        x.asInstanceOf[Number].longValue()))
    case (x, TimestampType) =>
      val us = x.asInstanceOf[Number].longValue()
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case (x, TimestampNTZType) =>
      val us = x.asInstanceOf[Number].longValue()
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (x, StringType) => x.toString // Utf8 / enum symbol
    case (x: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b); b
    case (x: org.apache.avro.generic.GenericFixed, BinaryType) => x.bytes()
    case (x: java.util.Collection[_], ArrayType(el, _)) =>
      x.asScala.map(fromAvro(_, el)).toSeq
    case (x: java.util.Map[_, _], MapType(_, vt, _)) =>
      x.asScala.map { case (k, vv) => k.toString -> fromAvro(vv, vt) }.toMap
    case (x: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => fromAvro(x.get(f.name), f.dataType)))
    case (x, _) => x // primitives line up (boolean/int/long/float/double)
  }

  /** One DataFrame over every `.avro` container under `glob`; schema
    * from the first file's header (all files must share it). */
  def readAvro(spark: SparkSession, glob: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val g = new HPath(if (glob.contains("://")) glob else s"file://$glob")
    val fs0 = g.getFileSystem(conf.value)
    val expanded = Option(fs0.globStatus(g)).getOrElse(Array.empty)
    val files = expanded.flatMap { st =>
      if (st.isFile) Seq(st.getPath)
      else fs0.listStatus(st.getPath).filter(_.isFile).map(_.getPath).toSeq
    }.filter(p => p.getName.endsWith(".avro") && !p.getName.startsWith(".") &&
      !p.getName.startsWith("_")).map(_.toUri.toString).sorted.toSeq
    require(files.nonEmpty, s"readAvro: no .avro files match $glob")
    val sparkSchema = {
      val p = new HPath(files.head)
      val in = p.getFileSystem(conf.value).open(p)
      val r = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try sparkType(r.getSchema).asInstanceOf[StructType]
      finally r.close()
    }
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { uri =>
        val p = new HPath(uri)
        val in = p.getFileSystem(conf.value).open(p)
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        // close on task end even when the iterator is abandoned early
        // (limit/take) — exhaustion-only close leaks one handle per file
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: java.io.IOException => () }))
        // convert with the DRIVER's schema: the record converter fetches
        // fields BY NAME, so files that reorder fields still land right;
        // a file with different field NAMES is corruption — fail loudly
        // (GenericRecord.get(unknown) would silently null it)
        val names = reader.getSchema.getFields.asScala.map(_.name()).toSet
        require(names == sparkSchema.fieldNames.toSet,
          s"readAvro: $uri fields $names differ from ${files.head}'s " +
            s"${sparkSchema.fieldNames.toSet}")
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row =
            fromAvro(reader.next(), sparkSchema).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  // ---------------------------------------------------------- spark→avro

  /** Avro schema node for one Spark type (non-null shape). */
  private def avroType(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => LogicalTypes.localTimestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(el, containsNull) =>
      Schema.createArray(fieldSchema(el, containsNull, s"${path}_item"))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(fieldSchema(vt, valueContainsNull, s"${path}_value"))
    case st: StructType => recordSchema(st, path)
    case other => throw new IllegalArgumentException(
      s"toAvro: unsupported Spark type $other at $path")
  }

  private def fieldSchema(dt: DataType, nullable: Boolean,
                          path: String): Schema = {
    val base = avroType(dt, path)
    if (nullable) Schema.createUnion(
      java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
    else base
  }

  private def recordSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable,
        s"${name}_${f.name}"), null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  /** Spark row value → Avro value, following the Spark type. */
  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any =
    if (v == null) null
    else {
      val s = if (isNullableUnion(schema)) unionInner(schema) else schema
      (v, dt) match {
        // df.rdd externalizes datetimes as java.sql.* or java.time.*
        // depending on spark.sql.datetime.java8API.enabled — take both
        case (x: java.sql.Date, DateType) =>
          x.toLocalDate.toEpochDay.toInt
        case (x: java.time.LocalDate, DateType) => x.toEpochDay.toInt
        case (x: java.sql.Timestamp, TimestampType) =>
          val i = x.toInstant
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
            i.getNano / 1000L)
        case (x: java.time.Instant, TimestampType) =>
          Math.addExact(Math.multiplyExact(x.getEpochSecond, 1000000L),
            x.getNano / 1000L)
        case (x: java.time.LocalDateTime, TimestampNTZType) =>
          Math.addExact(Math.multiplyExact(
            x.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
            x.getNano / 1000L)
        case (x: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(x)
        case (x: Byte, _) => x.toInt
        case (x: Short, _) => x.toInt
        case (x: scala.collection.Seq[_], ArrayType(el, _)) =>
          // Row.get externalizes arrays as mutable.ArraySeq — match the
          // collection root, not the immutable default alias
          x.map(toAvroValue(_, el, s.getElementType)).toSeq.asJava
        case (x: scala.collection.Map[_, _], MapType(_, vt, _)) =>
          x.map { case (k, vv) =>
            k.toString -> toAvroValue(vv, vt, s.getValueType)
          }.toMap.asJava
        case (x: Row, st: StructType) =>
          val rec = new GenericData.Record(s)
          st.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, toAvroValue(x.get(i), f.dataType,
              s.getField(f.name).schema()))
          }
          rec
        case (x, _) => x
      }
    }

  /** Write `df` as one `.avro` container per partition under `path`
    * (executor-parallel; the part layout mirrors parquet writes). */
  def toAvro(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val sparkSchema = df.schema
    val schemaJson = recordSchema(sparkSchema, "row").toString
    val dir = new HPath(if (path.contains("://")) path else s"file://$path")
    val fs = dir.getFileSystem(conf.value)
    require(!fs.exists(dir), s"toAvro: $path already exists")
    fs.mkdirs(dir)
    val written = df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        // task-retry/speculation safety: write a per-ATTEMPT dot-temp
        // (readers skip dot/underscore names), then rename into place;
        // a prior successful attempt's final file wins and the loser's
        // temp is dropped — no committer needed for this layout
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val part = "part-%05d.avro".format(i)
        val tmp = new HPath(s"${dir.toUri}/.tmp-$part-a$attempt")
        val fin = new HPath(s"${dir.toUri}/$part")
        val fs = tmp.getFileSystem(conf.value)
        val out = fs.create(tmp, false)
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var n = 0L
        try rows.foreach { r =>
          w.append(toAvroValue(r, sparkSchema, schema)
            .asInstanceOf[GenericRecord])
          n += 1
        } finally w.close()
        if (fs.exists(fin) || !fs.rename(tmp, fin)) {
          fs.delete(tmp, false)
          n = 0L
        }
        Iterator.single(n)
      }
    }.sum()
    require(written >= 0) // force the action even for an empty frame
  }
}
