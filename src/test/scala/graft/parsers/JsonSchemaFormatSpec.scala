package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[JsonSchemaFormat]]: both registry dialects -> StructType, both
  * emit directions, round-trip laws, and the decode operator. */
class JsonSchemaFormatSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tag", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("flags", ArrayType(IntegerType), nullable = false),
    StructField("amount", DecimalType(12, 2), nullable = false),
    StructField("raw", BinaryType, nullable = true),
    StructField("nested", StructType(Seq(
      StructField("k", ShortType, nullable = false),
      StructField("ok", BooleanType, nullable = true))), nullable = false)))

  test("confluent dialect: connect.index ordering, oneOf-null, connect.type") {
    val doc =
      """{"type":"object","properties":{
        |  "b": {"type":"integer","connect.type":"int32","connect.index":1},
        |  "a": {"type":"integer","connect.type":"int64","connect.index":0},
        |  "c": {"oneOf":[{"type":"null"},{"type":"string"}],"connect.index":2},
        |  "d": {"type":"number","connect.type":"float32","connect.index":3},
        |  "e": {"type":"string","connect.type":"bytes","connect.index":4}
        |}}""".stripMargin
    val st = JsonSchemaFormat.confluentToStruct(doc)
    assert(st.fieldNames.toSeq == Seq("a", "b", "c", "d", "e"))
    assert(st("a").dataType == LongType && !st("a").nullable)
    assert(st("b").dataType == IntegerType)
    assert(st("c").dataType == StringType && st("c").nullable)
    assert(st("d").dataType == FloatType)
    assert(st("e").dataType == BinaryType)
  }

  test("kafka-connect dialect: widths, optionality, nesting, arrays") {
    val doc =
      """{"type":"struct","fields":[
        |  {"field":"k","type":"int16","optional":false},
        |  {"field":"u","type":"uint64","optional":false},
        |  {"field":"v","type":"double","optional":true},
        |  {"field":"xs","type":"array","optional":false,
        |   "items":{"type":"int32","optional":false}},
        |  {"field":"sub","type":"struct","optional":false,"fields":[
        |    {"field":"s","type":"string","optional":true}]}
        |]}""".stripMargin
    val st = JsonSchemaFormat.kafkaConnectToStruct(doc)
    assert(st("k").dataType == ShortType)
    assert(st("u").dataType == DecimalType(20, 0)) // unsigned widening
    assert(st("v").dataType == DoubleType && st("v").nullable)
    assert(st("xs").dataType == ArrayType(IntegerType))
    assert(st("sub").dataType == StructType(Seq(
      StructField("s", StringType, nullable = true))))
  }

  test("round trip: struct -> confluent -> struct") {
    val doc = JsonSchemaFormat.structToConfluent(rowSchema, title = "row")
    assert(JsonSchemaFormat.confluentToStruct(doc) == rowSchema)
  }

  test("round trip: struct -> kafka-connect -> struct") {
    val doc = JsonSchemaFormat.structToKafkaConnect(rowSchema, name = "row")
    assert(JsonSchemaFormat.kafkaConnectToStruct(doc) == rowSchema)
  }

  test("dialect bridge: kafka emit parses as the same struct the " +
    "confluent emit parses (the reference converter's equivalence)") {
    val viaKafka = JsonSchemaFormat.toStruct(
      JsonSchemaFormat.structToKafkaConnect(rowSchema))
    val viaConf = JsonSchemaFormat.toStruct(
      JsonSchemaFormat.structToConfluent(rowSchema))
    assert(viaKafka == viaConf)
  }

  test("closed content model marks before/after row objects only") {
    val env = StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("after", StructType(Seq(
        StructField("id", LongType, nullable = false))), nullable = true)))
    val doc = JsonSchemaFormat.structToConfluent(env,
      closedContentModel = true)
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
    val after = m.at("/properties/after/oneOf/1")
    assert(after.path("additionalProperties").asBoolean(true) == false)
    assert(!m.has("additionalProperties")) // envelope root stays open
  }

  test("parse operator decodes payloads under either dialect") {
    val payloads = Seq(
      (1L, """{"id": 1, "tag": "x", "score": 2.5}"""),
      (2L, """{"id": 2, "tag": null, "score": -1.0}"""))
      .toDF("seq", "payload")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false)))
    for (doc <- Seq(JsonSchemaFormat.structToConfluent(schema),
        JsonSchemaFormat.structToKafkaConnect(schema))) {
      val got = JsonSchemaFormat.parse(payloads, "payload", doc)
        .select("seq", "id", "tag", "score")
        .as[(Long, Long, Option[String], Double)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, 1L, Some("x"), 2.5),
        (2L, 2L, None, -1.0)))
    }
  }
}
