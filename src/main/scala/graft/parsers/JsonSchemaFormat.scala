package graft.parsers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Registry JSON-schema dialect support: the two schema documents a
  * queue consumer meets in the wild — the Kafka-Connect envelope
  * schema (`{"type":"struct","fields":[{"field":…,"type":"int64",
  * "optional":…}]}`) and the Confluent JSON-Schema flavor (draft-7
  * `properties`/`oneOf` with `connect.index`/`connect.type`
  * annotations) — mapped onto a Spark `StructType`, in both
  * directions (cf. the reference's dialect converter,
  * pkg/schemaregistry/format/json_schema_format.go:120-258, which
  * converts between the same two forms; here both land on Catalyst's
  * native schema type so decoding is a single codegen'd `from_json`).
  *
  * Dialect rules mirrored from the public Connect conventions:
  *   - optionality: Kafka dialect `optional: true`; Confluent dialect
  *     `oneOf: [{"type":"null"}, X]` (json_schema_format.go:121-129)
  *   - field order: Confluent `properties` is an unordered map; order
  *     is recovered from `connect.index` (json_schema_format.go:139-141)
  *   - `integer` refines via `connect.type` int8/int16/int32/int64;
  *     `number` via float32/float64; `string` + `connect.type: bytes`
  *     is binary (json_schema_format.go:73-96)
  *   - `connect.parameters` precision/scale declare a decimal — kept
  *     as DecimalType here (Spark-native) rather than Connect's
  *     base64-bytes encoding
  *   - unsigned widths (a Kafka-dialect artifact of database sources)
  *     widen to the next signed Spark type; uint64 → DECIMAL(20,0)
  *
  * Scale shape: schema documents are parsed ONCE on the driver (they
  * are KB-sized registry payloads); the per-row work is `from_json`
  * over the derived StructType — whole-stage codegen, no UDF.
  */
object JsonSchemaFormat {
  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- parse

  /** Auto-detect the dialect and derive the Spark schema. */
  def toStruct(schemaJson: String): StructType = {
    val root = mapper.readTree(schemaJson)
    if (root.path("type").asText() == "struct") kafkaConnectToStruct(schemaJson)
    else confluentToStruct(schemaJson)
  }

  /** Kafka-Connect envelope schema document -> StructType. */
  def kafkaConnectToStruct(schemaJson: String): StructType = {
    val root = mapper.readTree(schemaJson)
    require(root.path("type").asText() == "struct",
      s"kafka-connect schema root must be a struct, got ${root.path("type")}")
    kafkaFields(root)
  }

  private def kafkaFields(n: JsonNode): StructType =
    StructType(n.path("fields").elements().asScala.map { f =>
      val (dt, _) = kafkaType(f)
      StructField(f.path("field").asText(), dt,
        nullable = f.path("optional").asBoolean(false))
    }.toSeq)

  private def kafkaType(f: JsonNode): (DataType, Boolean) = {
    val dt = f.path("type").asText() match {
      case "int8" => ByteType
      case "int16" => ShortType
      case "int32" => IntegerType
      case "int64" => LongType
      case "uint8" => ShortType
      case "uint16" => IntegerType
      case "uint32" => LongType
      case "uint64" => DecimalType(20, 0)
      case "float" | "float32" => FloatType
      case "double" | "float64" => DoubleType
      case "boolean" => BooleanType
      case "string" => StringType
      case "bytes" => decimalOr(f, BinaryType)
      case "struct" => kafkaFields(f)
      case "array" => ArrayType(kafkaType(f.path("items"))._1)
      case other => throw new IllegalArgumentException(
        s"unsupported kafka-connect type '$other'")
    }
    (dt, f.path("optional").asBoolean(false))
  }

  /** Confluent JSON-Schema document -> StructType. Field order comes
    * from `connect.index`; a field whose schema is
    * `oneOf [null, X]` is a nullable X. */
  def confluentToStruct(schemaJson: String): StructType = {
    val root = mapper.readTree(schemaJson)
    confluentType(root)._1 match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"confluent schema root must be an object, got $other")
    }
  }

  private def confluentType(n: JsonNode): (DataType, Boolean) = {
    if (n.has("oneOf")) {
      // [null, X]: the non-null branch, made nullable
      val branch = n.path("oneOf").elements().asScala
        .find(_.path("type").asText() != "null")
        .getOrElse(throw new IllegalArgumentException(
          "oneOf with no non-null branch"))
      (confluentType(branch)._1, true)
    } else n.path("type").asText() match {
      case "object" =>
        val fields = n.path("properties").fields().asScala.toSeq
          .map { e => (e.getKey, e.getValue) }
          .sortBy { case (_, v) => v.path("connect.index").asInt(Int.MaxValue) }
          .map { case (name, v) =>
            val (dt, nullable) = confluentType(v)
            StructField(name, dt, nullable)
          }
        (StructType(fields), false)
      case "boolean" => (BooleanType, false)
      case "string" =>
        (if (n.path("connect.type").asText() == "bytes") decimalOr(n, BinaryType)
         else StringType, false)
      case "integer" => (n.path("connect.type").asText() match {
        case "int8" => ByteType
        case "int16" => ShortType
        case "int32" => IntegerType
        case _ => LongType
      }, false)
      case "number" => (n.path("connect.type").asText() match {
        case "float32" => FloatType
        case _ => decimalOr(n, DoubleType)
      }, false)
      case "array" => (ArrayType(confluentType(n.path("items"))._1), false)
      case other => throw new IllegalArgumentException(
        s"unsupported confluent json-schema type '$other'")
    }
  }

  /** connect.parameters {connect.decimal.precision, scale} -> decimal;
    * otherwise the fallback type. Checks both dialects' parameter
    * carrier key. */
  private def decimalOr(n: JsonNode, fallback: DataType): DataType = {
    val params =
      if (n.has("connect.parameters")) n.path("connect.parameters")
      else n.path("parameters")
    val prec = params.path("connect.decimal.precision").asText("")
    val scale = params.path("scale").asText("")
    if (prec.nonEmpty)
      DecimalType(prec.toInt, if (scale.nonEmpty) scale.toInt else 0)
    else fallback
  }

  // ----------------------------------------------------------------- emit

  /** StructType -> Kafka-Connect schema JSON (the envelope `schema`
    * half of a schemas-enabled Connect record). */
  def structToKafkaConnect(st: StructType, name: String = ""): String = {
    val root = kafkaNode(st, nullable = false)
    if (name.nonEmpty) root.put("name", name)
    mapper.writeValueAsString(root)
  }

  private def kafkaNode(dt: DataType, nullable: Boolean): ObjectNode = {
    val n = mapper.createObjectNode()
    dt match {
      case st: StructType =>
        n.put("type", "struct")
        val fields = n.putArray("fields")
        st.fields.foreach { f =>
          val fn = kafkaNode(f.dataType, f.nullable)
          fn.put("field", f.name)
          fields.add(fn)
        }
      case ArrayType(et, _) =>
        n.put("type", "array")
        n.set[ObjectNode]("items", kafkaNode(et, nullable = false))
      case d: DecimalType =>
        n.put("type", "bytes")
        val p = n.putObject("parameters")
        p.put("connect.decimal.precision", d.precision.toString)
        p.put("scale", d.scale.toString)
      case other => n.put("type", other match {
        case ByteType => "int8"
        case ShortType => "int16"
        case IntegerType => "int32"
        case LongType => "int64"
        case FloatType => "float"
        case DoubleType => "double"
        case BooleanType => "boolean"
        case StringType => "string"
        case BinaryType => "bytes"
        case t => throw new IllegalArgumentException(s"unsupported $t")
      })
    }
    n.put("optional", nullable)
    n
  }

  /** StructType -> Confluent JSON-Schema. Nullable fields emit as
    * `oneOf [null, X]`; every property carries its `connect.index`.
    * `closedContentModel` sets `additionalProperties: false` on the
    * `before`/`after` row objects of a CDC envelope (the registry's
    * closed-content compatibility mode). */
  def structToConfluent(st: StructType, title: String = "",
                        closedContentModel: Boolean = false): String = {
    val root = confluentNode(st, depth = 0, closedContentModel,
      inRowObject = false)
    if (title.nonEmpty) root.put("title", title)
    mapper.writeValueAsString(root)
  }

  private def confluentNode(dt: DataType, depth: Int,
                            closed: Boolean, inRowObject: Boolean): ObjectNode = {
    val n = mapper.createObjectNode()
    dt match {
      case st: StructType =>
        n.put("type", "object")
        val props = n.putObject("properties")
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val isRow = f.name == "before" || f.name == "after"
          val child = confluentField(f.dataType, f.nullable, depth + 1,
            closed, inRowObject || isRow)
          child.put("connect.index", i)
          props.set[ObjectNode](f.name, child)
        }
        if (closed && depth == 2 && inRowObject)
          n.put("additionalProperties", false)
      case ArrayType(et, _) =>
        n.put("type", "array")
        n.set[ObjectNode]("items",
          confluentNode(et, depth + 1, closed, inRowObject))
      case d: DecimalType =>
        n.put("type", "number")
        val p = n.putObject("connect.parameters")
        p.put("connect.decimal.precision", d.precision.toString)
        p.put("scale", d.scale.toString)
      case other =>
        val (t, ct) = other match {
          case ByteType => ("integer", "int8")
          case ShortType => ("integer", "int16")
          case IntegerType => ("integer", "int32")
          case LongType => ("integer", "int64")
          case FloatType => ("number", "float32")
          case DoubleType => ("number", "float64")
          case BooleanType => ("boolean", "")
          case StringType => ("string", "")
          case BinaryType => ("string", "bytes")
          case t2 => throw new IllegalArgumentException(s"unsupported $t2")
        }
        n.put("type", t)
        if (ct.nonEmpty) n.put("connect.type", ct)
    }
    n
  }

  private def confluentField(dt: DataType, nullable: Boolean, depth: Int,
                             closed: Boolean, inRowObject: Boolean): ObjectNode =
    if (!nullable) confluentNode(dt, depth, closed, inRowObject)
    else {
      val n = mapper.createObjectNode()
      val oneOf = n.putArray("oneOf")
      val nul = mapper.createObjectNode(); nul.put("type", "null")
      oneOf.add(nul)
      // the oneOf wrapper is itself a nesting level (matching the
      // reference's depth accounting, json_schema_format.go:176,225)
      oneOf.add(confluentNode(dt, depth + 1, closed, inRowObject))
      n
    }

  // ------------------------------------------------------------- operator

  /** Decode a JSON payload column under a registry-declared schema
    * (either dialect): one codegen'd `from_json`, schema derived once
    * on the driver. Returns the input plus the decoded columns. */
  def parse(df: DataFrame, rawCol: String, schemaJson: String): DataFrame = {
    val st = toStruct(schemaJson)
    df.withColumn("__rec", from_json(col(rawCol), st))
      .select(df.columns.map(col) :+ col("__rec.*"): _*)
  }
}
