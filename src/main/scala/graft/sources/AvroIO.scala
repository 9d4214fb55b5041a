package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container-file (OCF) source and sink.
  *
  * The reference ships Avro only inside the Confluent wire framing
  * (reference: pkg/parsers/registry/confluentschemaregistry); this adds the
  * standalone container-file form a lake actually stores, built on the same
  * avro-generic jar. Spark's own `spark-avro` module is not on the image's
  * classpath, so the container I/O is implemented here directly — with the
  * same scale shape Spark's datasource uses:
  *
  *  - WRITE: one container file per partition, written by the executors
  *    through the Hadoop FS API (works on HDFS/S3A the same as local).
  *  - READ: files are cut into byte-range splits (default 128 MB) on the
  *    driver from LISTED METADATA ONLY (no data read), and each task uses
  *    the Avro sync-marker protocol (`sync(start)` / `pastSync(end)`) to
  *    align its range to block boundaries — so a 100 TB lake of large
  *    files still fans out across the cluster instead of one task per file.
  *
  * Type mapping follows the public Avro spec logical types: timestamps as
  * `long/timestamp-micros`, dates as `int/date`, decimals as
  * `bytes/decimal(p,s)`; nullable columns as `union(null, T)`.
  */
object AvroIO {

  // ---------------------------------------------------------------- schema

  /** Spark → Avro schema. Record/field names must already be valid Avro
    * identifiers (true for every engine table; enforced by the builder). */
  def toAvroSchema(st: StructType, recordName: String = "row"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = toAvroType(f.dataType, s"${recordName}_${f.name}")
      val sch =
        if (f.nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.asJava)
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val el = toAvroType(et, s"${name}_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), el)) else el)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, s"${name}_value")
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), v)) else v)
    case st: StructType => toAvroSchema(st, name)
    case other => throw new IllegalArgumentException(s"unsupported Spark type for Avro: $other")
  }

  /** Avro → Spark schema (inverse, for reading foreign files). */
  def toSparkType(s: Schema): DataType = unwrap(s)._1

  /** Returns (sparkType, nullable). */
  private def unwrap(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(branches.size == 1, s"only union(null, T) supported, got $s")
      (unwrap(branches.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false) else (IntegerType, false)
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => (TimestampType, false)
        case _: LogicalTypes.TimestampMillis => (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
        case _: LogicalTypes.LocalTimestampMillis => (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, n) = unwrap(s.getElementType)
      (ArrayType(et, n), false)
    case Schema.Type.MAP =>
      val (vt, n) = unwrap(s.getValueType)
      (MapType(StringType, vt, n), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, n) = unwrap(f.schema())
        StructField(f.name(), dt, n)
      }), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  // ------------------------------------------------------------- conversion

  /** Spark Row value → Avro datum, driven by the SPARK type (the Avro
    * schema was derived from it, so the shapes agree). */
  private def toAvro(v: Any, dt: DataType, sch: Schema): Any = {
    if (v == null) return null
    val s = nonNull(sch)
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType => v
      case ShortType => v.asInstanceOf[Short].toInt
      case ByteType => v.asInstanceOf[Byte].toInt
      case StringType => v.toString
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
        case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
      }
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val el = s.getElementType
        v.asInstanceOf[scala.collection.Seq[Any]].map(x => toAvro(x, et, el)).asJava
      case MapType(StringType, vt, _) =>
        val vs = s.getValueType
        val m = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, x) =>
          m.put(k, toAvro(x, vt, vs))
        }
        m
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvro(row.get(i), st(i).dataType, s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** Avro datum → Spark external value, driven by the SPARK type. */
  private def fromAvro(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType => v
      case StringType => v.toString // Utf8 / String / enum symbol
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case f: GenericData.Fixed => f.bytes()
      }
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case d: DecimalType =>
        val bytes = v match {
          case b: java.nio.ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: GenericData.Fixed => f.bytes()
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq.map(fromAvro(_, et))
      case MapType(StringType, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, x) => k.toString -> fromAvro(x, vt)
        }.toMap
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) => fromAvro(rec.get(i), f.dataType) })
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  // ------------------------------------------------------------------ write

  /** Write `df` as a directory of Avro container files, one per partition,
    * executor-side through the Hadoop FS API. `codec` is an Avro codec name
    * ("null", "deflate", "snappy", "zstandard" — zstd/snappy jars ship with
    * Spark). */
  def write(df: DataFrame, path: String, codec: String = "zstandard"): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(avroJson)
        val pid = TaskContext.getPartitionId()
        val file = new Path(dir, f"part-$pid%05d.avro")
        val out = file.getFileSystem(conf.value).create(file, true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
        w.create(schema, out)
        try {
          val n = sparkSchema.length
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) {
              rec.put(i, toAvro(row.get(i), sparkSchema(i).dataType, schema.getFields.get(i).schema()))
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes `out` too
      }
    }
  }

  // ------------------------------------------------------------------- read

  /** One byte-range split of one container file. The task aligns to the
    * next sync marker at/after `start` and stops at the first block whose
    * start is past `end` — the standard Avro split protocol, so ranges
    * tile a file with no dropped or doubled records. */
  private case class AvroSplit(file: String, start: Long, end: Long)

  /** Read a directory (or single file) of Avro container files. Split
    * planning touches only file metadata; data reads happen on executors. */
  def read(spark: SparkSession, path: String,
           maxSplitBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val files = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro") && st.getLen > 0)
      .sortBy(_.getPath.getName)
    require(files.nonEmpty, s"no .avro files under $path")

    // Schema from the first file's header (a metadata-sized read).
    val sparkSchema = {
      val in = fs.open(files.head.getPath)
      try {
        val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
        val sch = s.getSchema
        s.close()
        toSparkType(sch).asInstanceOf[StructType]
      } finally { try in.close() catch { case _: Throwable => () } }
    }

    val splits = files.flatMap { st =>
      val len = st.getLen
      (0L until len by maxSplitBytes).map { off =>
        AvroSplit(st.getPath.toString, off, math.min(off + maxSplitBytes, len))
      }
    }
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { sp =>
        val file = new Path(sp.file)
        val in = new org.apache.avro.mapred.FsInput(file, conf.value)
        val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        r.sync(sp.start)
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            if (closed) false
            else if (r.hasNext && !r.pastSync(sp.end)) true
            else { r.close(); closed = true; false }
          }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq(sparkSchema.fields.toSeq.zipWithIndex.map {
              case (f, i) => fromAvro(rec.get(i), f.dataType)
            })
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
