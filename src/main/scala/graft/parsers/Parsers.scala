package graft.parsers

import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Queue-message parsers: byte/string payloads -> typed rows, with an
  * unparsed-rows quarantine side output (reference: pkg/parsers —
  * `Parser.Do(Message, Partition) []ChangeItem`, abstract.go:35; the
  * workhorse GenericParser pkg/parsers/generic/generic_parser.go:406-556
  * with NewUnparsed quarantine at :575).
  */
object GenericParser {
  val CorruptCol = "_unparsed_reason"

  /** Parse a JSON string column against declared fields. Returns the
    * parsed frame; rows that fail to parse are dropped here and surface
    * in [[unparsed]] (PERMISSIVE + columnNameOfCorruptRecord — the Spark
    * rendering of the reference's per-row quarantine). */
  def json(df: DataFrame, rawCol: String, schema: StructType,
           keep: Seq[String] = Nil): DataFrame = {
    val p = parsedCol(df, rawCol, schema)
    p.filter(col(s"__p.$CorruptCol").isNull)
      .select((keep.map(col) ++
        schema.fieldNames.map(f => col(s"__p.$f").as(f))).toIndexedSeq: _*)
  }

  /** Quarantined rows: original payload + failure marker (reference:
    * generic_parser.go:575 NewUnparsed). */
  def unparsed(df: DataFrame, rawCol: String, schema: StructType,
               keep: Seq[String] = Nil): DataFrame = {
    val p = parsedCol(df, rawCol, schema)
    p.filter(col(s"__p.$CorruptCol").isNotNull)
      .select((keep.map(col) :+ col(rawCol).as("unparsed_raw")).toIndexedSeq: _*)
  }

  private def parsedCol(df: DataFrame, rawCol: String,
                        schema: StructType): DataFrame =
    df.withColumn("__p", from_json(col(rawCol),
      StructType(schema.fields :+ StructField(CorruptCol, StringType)),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))

  /** TSKV (tab-separated key=value) parse (reference:
    * pkg/parsers/registry/tskv; generic parser handles both formats). */
  def tskv(df: DataFrame, rawCol: String, fields: Seq[(String, DataType)],
           keep: Seq[String] = Nil): DataFrame = {
    val m = str_to_map(col(rawCol), lit("\t"), lit("="))
    df.select((keep.map(col) ++ fields.map { case (f, t) =>
      element_at(m, f).cast(t).as(f)
    }).toIndexedSeq: _*)
  }
}

/** XML payload parser: one XML document per row → typed columns, with
  * the same quarantine contract as [[GenericParser]] (unparsable rows
  * surface with their raw payload, never poison the batch).
  *
  * Field paths: `"child"` (text of the first child element with that
  * name, searched recursively) or `"@attr"` (root-element attribute).
  * Parsing is hardened per the public XXE guidance: DTDs disallowed,
  * external entities disabled — a payload cannot reach the filesystem
  * or network through entity expansion.
  */
object XmlParser {

  private def secureFactory(): javax.xml.parsers.SAXParserFactory = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setNamespaceAware(false)
    f
  }

  private def extract(root: scala.xml.Elem, path: String): String =
    if (path.startsWith("@"))
      root.attribute(path.substring(1)).map(_.text).orNull
    else {
      val hits = root \\ path
      if (hits.isEmpty) null else hits.head.text
    }

  private def parsedCol(df: DataFrame, rawCol: String,
                        paths: Seq[String]): DataFrame = {
    val extractAll = udf { (s: String) =>
      if (s == null) null
      else try {
        val loader = scala.xml.XML.withSAXParser(secureFactory().newSAXParser())
        val root = loader.loadString(s)
        paths.map(p => extract(root, p))
      } catch { case scala.util.control.NonFatal(_) => null }
    }
    df.withColumn("__x", extractAll(col(rawCol)))
  }

  /** Parsed rows only, with typed columns per `(name, path, type)`. */
  def parse(df: DataFrame, rawCol: String,
            fields: Seq[(String, String, DataType)],
            keep: Seq[String] = Nil): DataFrame = {
    val p = parsedCol(df, rawCol, fields.map(_._2))
    p.filter(col("__x").isNotNull)
      .select((keep.map(col) ++ fields.zipWithIndex.map {
        case ((name, _, t), i) =>
          element_at(col("__x"), i + 1).cast(t).as(name)
      }).toIndexedSeq: _*)
  }

  /** The quarantine route: rows whose payload failed to parse. */
  def unparsed(df: DataFrame, rawCol: String,
               fields: Seq[(String, String, DataType)],
               keep: Seq[String] = Nil): DataFrame =
    parsedCol(df, rawCol, fields.map(_._2))
      .filter(col(rawCol).isNotNull && col("__x").isNull)
      .select((keep.map(col) :+ col(rawCol).as("unparsed_raw")).toIndexedSeq: _*)
}

/** wal2json (PostgreSQL logical-decoding JSON) parser (reference:
  * pkg/providers/postgres/wal2json_parser.go + change_processor.go; the
  * format is the public wal2json plugin output: one JSON document per
  * transaction with a `change` array of
  * {kind, schema, table, columnnames, columnvalues, oldkeys}).
  *
  * Values arrive as a JSON array aligned with columnnames; this parser
  * keeps that positional representation and projects the declared
  * columns by name, casting from the JSON text form — the Spark
  * rendering of the reference's column-name/value pairing. */
object Wal2Json {
  def receive(df: DataFrame, jsonCol: String, rowSchema: StructType,
              pkCols: Seq[String]): DataFrame = {
    val changeSchema = StructType(Seq(
      StructField("kind", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("columnnames", ArrayType(StringType)),
      StructField("columnvalues", ArrayType(StringType)),
      StructField("oldkeys", StructType(Seq(
        StructField("keynames", ArrayType(StringType)),
        StructField("keyvalues", ArrayType(StringType)))))))
    val txSchema = StructType(Seq(
      StructField("xid", LongType),
      StructField("nextlsn", StringType),
      StructField("change", ArrayType(changeSchema))))
    val exploded = df.withColumn("__tx", from_json(col(jsonCol), txSchema))
      .select(col("__tx.xid").as("__xid"),
        col("__tx.nextlsn").as("__nextlsn"), posexplode(col("__tx.change")))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__c")
    def valueOf(f: StructField): Column = {
      val idx = array_position(col("__c.columnnames"), f.name)
      when(idx > 0, element_at(col("__c.columnvalues"), idx.cast("int")))
        .otherwise(lit(null)).cast(f.dataType).as(f.name)
    }
    def oldKeyOf(k: String): Column = {
      val idx = array_position(col("__c.oldkeys.keynames"), k)
      when(idx > 0, element_at(col("__c.oldkeys.keyvalues"), idx.cast("int")))
        .otherwise(lit(null))
        .cast(rowSchema(k).dataType).as(k)
    }
    // key columns fall back to the oldkeys pre-image — deletes carry the
    // key ONLY there (the reference's OldOrCurrentKeys semantics,
    // change_item.go OldOrCurrentKeysString)
    def keyOrValue(f: StructField): Column =
      if (pkCols.contains(f.name))
        coalesce(valueOf(f), oldKeyOf(f.name)).as(f.name)
      else valueOf(f)
    exploded.select((rowSchema.fields.map(keyOrValue).toSeq ++ Seq(
      col("__c.kind").as(E.Kind),
      col("__xid").cast(StringType).as(E.TxId),
      pgLsnToLong(col("__nextlsn")).as(E.Lsn),
      col("__pos").as(E.Counter),
      concat(col("__c.schema"), lit("."), col("__c.table")).as(E.Table),
      when(col("__c.oldkeys").isNotNull,
        struct(pkCols.map(oldKeyOf): _*)).as(E.OldKeys))): _*)
  }

  /** PostgreSQL LSN text ("0/16B6698") to a monotone long:
    * high32 * 2^32 + low32 (the wire representation of pg_lsn). */
  def pgLsnToLong(lsn: Column): Column = {
    val parts = split(lsn, "/")
    conv(element_at(parts, 1), 16, 10).cast(LongType) * 4294967296L +
      conv(element_at(parts, 2), 16, 10).cast(LongType)
  }
}

/** MongoDB change-stream event parser (reference:
  * pkg/providers/mongo/change_stream.go + change_stream_watcher.go; the
  * event shape is the public change-stream document:
  * {operationType, documentKey:{_id}, fullDocument, clusterTime}).
  * `update` maps to the reference's dedicated mongo:update_document
  * kind (RowEventKinds includes it, change_item.go). */
object MongoChangeStream {
  private def opToKind(op: Column): Column =
    when(op === "insert", E.Insert)
      .when(op === "replace", E.Update)
      .when(op === "update", E.MongoUpdateDocument)
      .when(op === "delete", E.Delete)

  def receive(df: DataFrame, jsonCol: String, docSchema: StructType): DataFrame = {
    val evSchema = StructType(Seq(
      StructField("operationType", StringType),
      StructField("documentKey", StructType(Seq(StructField("_id", StringType)))),
      StructField("fullDocument", docSchema),
      StructField("clusterTime", LongType)))
    val p = df.withColumn("__e", from_json(col(jsonCol), evSchema))
    p.select((Seq(col("__e.documentKey._id").as("_id")) ++
      docSchema.fieldNames.map(f => col(s"__e.fullDocument.$f").as(f)) ++ Seq(
        opToKind(col("__e.operationType")).as(E.Kind),
        col("__e.clusterTime").as(E.Lsn),
        lit(0).as(E.Counter))): _*)
  }
}

/** CloudEvents 1.0 structured-JSON parser (reference:
  * pkg/parsers/registry/cloudevents; the envelope is the public CNCF
  * CloudEvents spec: specversion/id/source/type/time/data). */
object CloudEvents {
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("specversion", StringType),
    StructField("id", StringType),
    StructField("source", StringType),
    StructField("type", StringType),
    StructField("subject", StringType),
    StructField("time", TimestampType),
    StructField("datacontenttype", StringType)))

  /** Parse the envelope; `dataSchema` types the `data` attribute. */
  def parse(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val full = StructType(EnvelopeSchema.fields :+ StructField("data", dataSchema))
    val p = df.withColumn("__ce", from_json(col(jsonCol), full))
    p.select((EnvelopeSchema.fieldNames.map(f => col(s"__ce.$f").as(s"ce_$f")) ++
      dataSchema.fieldNames.map(f => col(s"__ce.data.$f").as(f))).toIndexedSeq: _*)
  }
}

/** raw_to_table parser: keep the raw payload as a column plus queue
  * metadata (reference: pkg/parsers/registry/raw_to_table — rows are
  * (topic, partition, offset, ts, raw bytes)). */
object RawToTable {
  def parse(df: DataFrame, rawCol: String,
            metaCols: Seq[String] = Nil): DataFrame =
    df.select((metaCols.map(col) :+
      col(rawCol).cast(BinaryType).as("raw")).toIndexedSeq: _*)
}

/** Protobuf reader plumbing (reference: s3/reader/registry/proto and
  * pkg/parsers/registry/protobuf). The container carries no
  * spark-protobuf connector and no descriptor compiler, so the decode
  * kernel is pluggable: callers hand a message decoder (bytes =>
  * values) generated from their descriptor; the Spark-side batch
  * contract (binary column in, typed struct out, partition-parallel)
  * is the real surface, as with [[graft.functions.Multimodal]]. */
object ProtoReader {
  def parse(df: DataFrame, rawCol: String, outSchema: StructType,
            decode: Array[Byte] => Seq[Any]): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(rawCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row.fromSeq(
          decode(r.get(idx).asInstanceOf[Array[Byte]]))
      }
    }(enc)
  }

  /** Tiny wire-format scalar decoder for tests and schema-less
    * inspection: returns (fieldNumber -> varint value) for messages of
    * varint fields only (wire type 0). Public protobuf encoding. */
  def varintFields(bytes: Array[Byte]): Map[Int, Long] = {
    var i = 0
    val out = scala.collection.mutable.Map[Int, Long]()
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = bytes(i); i += 1; v |= (b & 0x7fL) << shift
               shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    while (i < bytes.length) {
      val tag = varint()
      val wireType = (tag & 7).toInt
      require(wireType == 0, s"varintFields handles wire type 0 only, got $wireType")
      out((tag >> 3).toInt) = varint()
    }
    out.toMap
  }

  /** Scalar wire value of one field occurrence. */
  sealed trait WireValue
  final case class VarintV(v: Long) extends WireValue
  final case class Fixed64V(v: Long) extends WireValue
  final case class Fixed32V(v: Int) extends WireValue
  final case class BytesV(v: Array[Byte]) extends WireValue

  /** Full scalar wire-format decode (public protobuf encoding,
    * https://protobuf.dev/programming-guides/encoding/): walks every
    * field of a message and returns (fieldNumber -> last occurrence) —
    * proto3 last-wins semantics for non-repeated scalars. Handles all
    * four scalar wire types; groups (deprecated) are rejected. No
    * protobuf runtime required. */
  def wireFields(bytes: Array[Byte]): Map[Int, WireValue] = {
    var i = 0
    val out = scala.collection.mutable.Map[Int, WireValue]()
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = bytes(i); i += 1; v |= (b & 0x7fL) << shift
               shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    while (i < bytes.length) {
      val tag = varint()
      val field = (tag >> 3).toInt
      (tag & 7).toInt match {
        case 0 => out(field) = VarintV(varint())
        case 1 =>
          var v = 0L
          for (j <- 0 until 8) { v |= (bytes(i + j) & 0xffL) << (8 * j) }
          i += 8; out(field) = Fixed64V(v)
        case 2 =>
          val len = varint().toInt
          out(field) = BytesV(bytes.slice(i, i + len)); i += len
        case 5 =>
          var v = 0
          for (j <- 0 until 4) { v |= (bytes(i + j) & 0xff) << (8 * j) }
          i += 4; out(field) = Fixed32V(v)
        case wt => throw new IllegalArgumentException(s"wire type $wt unsupported")
      }
    }
    out.toMap
  }

  /** Zigzag decode for sint32/sint64 varints (public encoding:
    * positive n -> 2n, negative n -> 2|n|-1). */
  def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Typed scalar decode against a (fieldNumber -> name) mapping and an
    * output schema: the schema-driven path of the reference's protobuf
    * parser (pkg/parsers/registry/protobuf) for scalar messages. Value
    * conversion follows proto3: varint -> integral/bool, fixed64 ->
    * double bits, fixed32 -> float bits, length-delimited -> string or
    * bytes per the declared Spark type. Missing fields null out.
    *
    * The wire does not distinguish int64 from sint64 — sint fields MUST
    * be declared in `sintFields` to get their zigzag decode; an
    * undeclared sint field would silently decode 2|n|-1 instead of -n
    * (there is no way to detect this from bytes alone). */
  def decodeScalar(fields: Map[Int, String], schema: StructType,
                   sintFields: Set[String] = Set.empty)
                  (bytes: Array[Byte]): Seq[Any] = {
    val wire = wireFields(bytes)
    val byName = fields.map(_.swap)
    schema.fields.toSeq.map { f =>
      byName.get(f.name).flatMap(wire.get) match {
        case None => null
        case Some(v) =>
          def vi(x: Long): Long = if (sintFields(f.name)) zigzag(x) else x
          (v, f.dataType) match {
          case (VarintV(x), LongType) => vi(x)
          case (VarintV(x), IntegerType) => vi(x).toInt
          case (VarintV(x), BooleanType) => x != 0L
          case (Fixed64V(x), DoubleType) => java.lang.Double.longBitsToDouble(x)
          case (Fixed64V(x), LongType) => x
          case (Fixed32V(x), FloatType) => java.lang.Float.intBitsToFloat(x)
          case (Fixed32V(x), IntegerType) => x
          case (BytesV(x), StringType) => new String(x, "UTF-8")
          case (BytesV(x), BinaryType) => x
          case (other, dt) => throw new IllegalArgumentException(
            s"field ${f.name}: cannot decode $other as $dt")
        }
      }
    }
  }

  /** Parse a binary column of scalar protobuf messages into typed rows.
    * Declare sint32/sint64 fields in `sintFields` (zigzag decode). */
  def parseScalar(df: DataFrame, rawCol: String,
                  fields: Map[Int, String], schema: StructType,
                  sintFields: Set[String] = Set.empty): DataFrame =
    parse(df, rawCol, schema, decodeScalar(fields, schema, sintFields))
}

/** Cloud-logging LogEntry parser (reference:
  * pkg/parsers/registry/cloudlogging; the entry shape is the public
  * cloud LogEntry: timestamp, severity, resource labels, and one of
  * textPayload / jsonPayload). Typed fields surface as columns; the
  * payload stays either text or a typed struct per `payloadSchema`. */
object CloudLogging {
  def parse(df: DataFrame, jsonCol: String,
            payloadSchema: Option[StructType] = None): DataFrame = {
    val base = Seq(
      StructField("timestamp", TimestampType),
      StructField("severity", StringType),
      StructField("logName", StringType),
      StructField("insertId", StringType),
      StructField("resource", StructType(Seq(
        StructField("type", StringType),
        StructField("labels", MapType(StringType, StringType))))),
      StructField("textPayload", StringType))
    val schema = StructType(payloadSchema
      .map(p => base :+ StructField("jsonPayload", p)).getOrElse(base))
    val p = df.withColumn("__l", from_json(col(jsonCol), schema))
    val core = Seq(
      col("__l.timestamp").as("ts"),
      col("__l.severity").as("severity"),
      col("__l.logName").as("log_name"),
      col("__l.insertId").as("insert_id"),
      col("__l.resource.type").as("resource_type"),
      col("__l.resource.labels").as("resource_labels"),
      col("__l.textPayload").as("text_payload"))
    p.select((core ++ payloadSchema.toSeq.flatMap(_.fieldNames.map(f =>
      col(s"__l.jsonPayload.$f").as(f)))): _*)
  }
}

/** Confluent Schema-Registry wire-format framing (reference:
  * pkg/parsers/registry/confluentschemaregistry and pkg/schemaregistry;
  * the framing is the public Confluent format: magic byte 0x00 + 4-byte
  * big-endian schema id + serialized payload). Registry lookup and
  * Avro decode are pluggable (no egress in this container); the framing
  * split — per-message schema id + payload bytes — is the engine-side
  * contract that routing and schema-evolution logic build on. */
object ConfluentFraming {
  def parse(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol).cast(BinaryType)
    val magicOk = octet_length(raw) >= 5 &&
      substring(raw, 1, 1) === lit(Array[Byte](0))
    // big-endian int from bytes 2..5
    val id = (0 until 4).map { i =>
      conv(hex(substring(raw, 2 + i, 1)), 16, 10).cast(LongType) *
        (1L << (8 * (3 - i)))
    }.reduce(_ + _)
    df.withColumn("schema_id",
        when(magicOk, id.cast(IntegerType)).otherwise(lit(null)))
      .withColumn("payload",
        when(magicOk, raw.substr(lit(6), octet_length(raw) - 5))
          .otherwise(lit(null)))
      .withColumn("framing_ok", magicOk)
  }
}

/** The reference's NATIVE serialized ChangeItem format (reference:
  * pkg/parsers/registry/native/parser_native.go →
  * abstract.UnmarshalChangeItems, restore.go:344; wire shape per the
  * committed canondata: one JSON ARRAY of change items per message,
  * lowercase keys {id, nextlsn, commitTime(ns), txPosition, kind,
  * schema, table, part, columnnames, columnvalues, oldkeys:{keynames,
  * keyvalues}, tx_id, query}). Consuming this means a graft pipeline
  * can read a queue the reference itself produced. Values are
  * positional like wal2json; declared columns are projected by name and
  * cast from their JSON text form. */
object NativeChangeItems {
  def receive(df: DataFrame, jsonCol: String, rowSchema: StructType,
              pkCols: Seq[String]): DataFrame = {
    val itemSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("nextlsn", LongType),
      StructField("commitTime", LongType),
      StructField("txPosition", IntegerType),
      StructField("kind", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("part", StringType),
      StructField("columnnames", ArrayType(StringType)),
      StructField("columnvalues", ArrayType(StringType)),
      StructField("oldkeys", StructType(Seq(
        StructField("keynames", ArrayType(StringType)),
        StructField("keyvalues", ArrayType(StringType))))),
      StructField("tx_id", StringType),
      StructField("query", StringType)))
    val exploded = df
      .select(posexplode(from_json(col(jsonCol), ArrayType(itemSchema)))
        .as(Seq("__pos", "__c")))
    def valueOf(f: StructField): Column = {
      val idx = array_position(col("__c.columnnames"), f.name)
      when(idx > 0, element_at(col("__c.columnvalues"), idx.cast("int")))
        .otherwise(lit(null)).cast(f.dataType).as(f.name)
    }
    def oldKeyOf(k: String): Column = {
      val idx = array_position(col("__c.oldkeys.keynames"), k)
      when(idx > 0, element_at(col("__c.oldkeys.keyvalues"), idx.cast("int")))
        .otherwise(lit(null)).cast(rowSchema(k).dataType).as(k)
    }
    def keyOrValue(f: StructField): Column =
      if (pkCols.contains(f.name))
        coalesce(valueOf(f), oldKeyOf(f.name)).as(f.name)
      else valueOf(f)
    exploded.select((rowSchema.fields.map(keyOrValue).toSeq ++ Seq(
      col("__c.kind").as(E.Kind),
      col("__c.nextlsn").as(E.Lsn),
      col("__c.txPosition").as(E.Counter),
      when(col("__c.tx_id") =!= "", col("__c.tx_id"))
        .otherwise(col("__c.id").cast(StringType)).as(E.TxId),
      nullif(col("__c.part"), lit("")).as(E.PartId),
      concat_ws(".", nullif(col("__c.schema"), lit("")), col("__c.table"))
        .as(E.Table),
      // commitTime is ns in the reference; the envelope carries µs
      expr("__c.commitTime div 1000").as(E.CommitTime),
      when(size(col("__c.oldkeys.keynames")) > 0,
        struct(pkCols.map(oldKeyOf): _*)).as(E.OldKeys))): _*)
  }
}

/** Blank parser (reference: pkg/parsers/registry/blank/parser_blank.go
  * BlankSchema): expose queue messages verbatim under the fixed schema
  * {partition (pk), offset (pk, uint64), seq_no, source_id, c_time,
  * w_time, ip, lb_raw_message, lb_extra_fields} — the "do not parse,
  * just ship the raw log" mode. Composes over [[graft.sources.Readers
  * .fileQueue]] (or any frame with topic/partition/offset/value). */
object BlankParser {
  def fromQueue(queue: DataFrame): DataFrame =
    queue.select(
      col("partition").cast(StringType).as("partition"),
      col("offset").cast(DecimalType(20, 0)).as("offset"),
      col("offset").cast(DecimalType(20, 0)).as("seq_no"),
      col("topic").as("source_id"),
      lit(null).cast(TimestampType).as("c_time"),
      lit(null).cast(TimestampType).as("w_time"),
      lit(null).cast(StringType).as("ip"),
      col("value").cast(StringType).as("lb_raw_message"),
      lit(null).cast(MapType(StringType, StringType)).as("lb_extra_fields"))
}

/** Cloud Audit Trails v1 events (reference:
  * pkg/parsers/registry/audittrailsv1/engine/parser.go): one JSON event
  * per line; the typed envelope (event id/source/type/time,
  * authentication, authorization, request metadata) lands as flattened
  * dot→underscore columns exactly like the reference's traversal
  * (parser.go:121-127); values redacted as "*** hidden ***" null out;
  * the full event rides along raw for fields outside the envelope (the
  * reference flattens them dynamically — a static-schema engine keeps
  * them queryable via JSON functions instead). */
object AuditTrails {
  private val Hidden = "*** hidden ***"

  def receive(df: DataFrame, jsonCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", StringType),
      StructField("event_source", StringType),
      StructField("event_type", StringType),
      StructField("event_time", TimestampType),
      StructField("authentication", StructType(Seq(
        StructField("authenticated", BooleanType),
        StructField("subject_type", StringType),
        StructField("subject_id", StringType),
        StructField("subject_name", StringType)))),
      StructField("authorization", StructType(Seq(
        StructField("authorized", BooleanType)))),
      StructField("request_metadata", StructType(Seq(
        StructField("remote_address", StringType),
        StructField("user_agent", StringType)))),
      StructField("event_status", StringType)))
    def unhide(c: Column): Column = when(c =!= Hidden, c)
    val p = df.withColumn("__e", from_json(col(jsonCol), schema))
    p.select(
      col("__e.event_id").as("event_id"),
      col("__e.event_source").as("event_source"),
      col("__e.event_type").as("event_type"),
      col("__e.event_time").as("event_time"),
      col("__e.authentication.authenticated").as("authentication_authenticated"),
      unhide(col("__e.authentication.subject_type")).as("authentication_subject_type"),
      unhide(col("__e.authentication.subject_id")).as("authentication_subject_id"),
      unhide(col("__e.authentication.subject_name")).as("authentication_subject_name"),
      col("__e.authorization.authorized").as("authorization_authorized"),
      unhide(col("__e.request_metadata.remote_address")).as("request_metadata_remote_address"),
      col("__e.event_status").as("event_status"),
      col(jsonCol).as("raw"))
  }
}

/** MySQL binlog row events in the Canal JSON envelope (reference:
  * pkg/providers/mysql/canal.go — the reference embeds a canal-compatible
  * binlog decoder; the JSON shape is the public Alibaba Canal format:
  * {data:[rowImage…], old:[changedCols…], database, table, es, id,
  * isDdl, type:INSERT|UPDATE|DELETE, pkNames}).
  *
  * Semantics preserved from the reference:
  *   - one change item per element of `data` (multi-row events fan out,
  *     ordered by their position → __counter);
  *   - UPDATE pairs `data[i]` (after) with `old[i]` (before, CHANGED
  *     columns only) — the PK pre-image is `coalesce(old.pk, data.pk)`,
  *     which feeds __old_keys so PK-changing updates can be split into
  *     delete+insert (Collapse.splitUpdatedPKeys);
  *   - Canal renders all values as strings; fields are cast to the
  *     declared row schema (canal.go value decoding);
  *   - DDL events (isDdl) are control items, dropped from the row stream.
  */
object MySqlBinlog {
  def receive(df: DataFrame, jsonCol: String, rowSchema: StructType,
              pkCols: Seq[String]): DataFrame = {
    // one json_tuple generator pass over the envelope (a from_json of
    // the full envelope gets re-evaluated per consuming expression by
    // filter pushdown / per-field schema pruning — measured 6 parses of
    // every message; a generator is evaluated exactly once), then two
    // small from_json calls for the row arrays only
    val rowsType = ArrayType(MapType(StringType, StringType))
    val p0 = df.select(json_tuple(col(jsonCol),
      "data", "old", "database", "table", "es", "id", "isDdl", "type")
      .as(Seq("__data", "__old", "__db", "__tbl", "__es", "__id",
        "__isddl", "__type")))
    val p = p0
      .filter(coalesce(col("__isddl"), lit("false")) =!= "true")
      .select(from_json(col("__old"), rowsType).as("__oldp"),
        col("__db"), col("__tbl"),
        col("__es").cast(LongType).as("__es"),
        col("__id").cast(LongType).as("__id"),
        upper(col("__type")).as("__type"),
        posexplode(from_json(col("__data"), rowsType))
          .as(Seq("__i", "__row")))
    val kind = when(col("__type") === "INSERT", E.Insert)
      .when(col("__type") === "UPDATE", E.Update)
      .when(col("__type") === "DELETE", E.Delete)
    val oldRow = element_at(col("__oldp"), col("__i") + 1)
    val oldKeys = when(kind === E.Update,
      struct(pkCols.map(k => coalesce(oldRow.getItem(k),
        col("__row").getItem(k)).cast(rowSchema(k).dataType).as(k)): _*))
    val fields = rowSchema.fields.toSeq.map(f =>
      col("__row").getItem(f.name).cast(f.dataType).as(f.name))
    p.select((fields ++ Seq(
      kind.as(E.Kind),
      col("__id").as(E.Lsn),
      col("__i").as(E.Counter),
      oldKeys.as(E.OldKeys),
      concat_ws(".", col("__db"), col("__tbl")).as(E.Table),
      (col("__es") * 1000).as(E.CommitTime))).toIndexedSeq: _*)
  }
}

/** Debezium CDC envelope receive/emit (reference: pkg/debezium/receiver.go
  * and emitter_common.go; the envelope is public Debezium format:
  * {before, after, op, ts_ms, source:{lsn, txId}}).
  */
object Debezium {
  /** op codes: c=create, r=snapshot read, u=update, d=delete. */
  private def opToKind(op: Column): Column =
    when(op.isin("c", "r"), E.Insert)
      .when(op === "u", E.Update)
      .when(op === "d", E.Delete)

  /** Parse a Debezium JSON payload column into the engine's CDC envelope.
    * `rowSchema` is the table's data schema (used for both before/after). */
  def receive(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val envSchema = StructType(Seq(
      StructField("before", rowSchema),
      StructField("after", rowSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("source", StructType(Seq(
        StructField("lsn", LongType),
        StructField("txId", StringType))))))
    val p = df.withColumn("__e", from_json(col(jsonCol), envSchema))
    // delete events carry the row image in `before`; others in `after`
    val img = when(col("__e.op") === "d", col("__e.before"))
      .otherwise(col("__e.after"))
    p.select((rowSchema.fieldNames.map(f => img.getField(f).as(f)) ++ Seq(
      opToKind(col("__e.op")).as(E.Kind),
      col("__e.source.lsn").as(E.Lsn),
      lit(0).as(E.Counter),
      col("__e.source.txId").as(E.TxId),
      (col("__e.ts_ms") * 1000).as(E.CommitTime))).toIndexedSeq: _*)
  }

  /** The Debezium JSON value as a column expression (composable into
    * wider wire frames, e.g. the Kafka key/value/topic contract). */
  def emitValue(dataCols: Seq[String]): Column = {
    val image = struct(dataCols.map(col): _*)
    val op = when(col(E.Kind) === E.Insert, "c")
      .when(col(E.Kind) === E.Update, "u")
      .when(col(E.Kind) === E.Delete, "d")
    to_json(struct(
      when(col(E.Kind) === E.Delete, image).as("before"),
      when(col(E.Kind) =!= E.Delete, image).as("after"),
      op.as("op"),
      (col(E.CommitTime) / 1000).cast(LongType).as("ts_ms"),
      struct(col(E.Lsn).as("lsn"),
        col(E.TxId).cast(StringType).as("txId")).as("source")))
  }

  /** Emit the engine's CDC envelope as Debezium JSON (the inverse;
    * reference: pkg/debezium emitter + pkg/serializer/queue debezium
    * serializer). Insert/update carry `after`; delete carries `before`. */
  def emit(df: DataFrame, dataCols: Seq[String]): DataFrame =
    df.select(emitValue(dataCols).as("value"))
}
