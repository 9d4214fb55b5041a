package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.types._
import ProtoDescriptors.{FieldDesc, TInt64, TInt32, TDouble, TString,
  TMessage, TSint64, TBool, LabelRepeated}
import ProtoWire._

class ProtoDescriptorsSpec extends SparkSpec {
  import spark.implicits._

  private val descSet = ProtoDescriptors.buildSet("shop", Seq(
    "Order" -> Seq(
      FieldDesc("id", 1, 1, TInt64, ""),
      FieldDesc("item", 2, 1, TMessage, ".shop.Item"),
      FieldDesc("tags", 3, LabelRepeated, TInt64, ""),
      FieldDesc("lines", 4, LabelRepeated, TMessage, ".shop.Line"),
      FieldDesc("neg", 5, 1, TSint64, ""),
      FieldDesc("ok", 6, 1, TBool, "")),
    "Item" -> Seq(
      FieldDesc("name", 1, 1, TString, ""),
      FieldDesc("price", 2, 1, TDouble, "")),
    "Line" -> Seq(
      FieldDesc("qty", 1, 1, TInt32, ""),
      FieldDesc("amount", 2, 1, TDouble, ""))))

  test("FileDescriptorSet round-trips through the wire-level bootstrap") {
    val reg = ProtoDescriptors.parseSet(descSet)
    assert(reg.keySet == Set("shop.Order", "shop.Item", "shop.Line"))
    val order = reg("shop.Order")
    assert(order.fields.map(_.name) ==
      Seq("id", "item", "tags", "lines", "neg", "ok"))
    assert(order.fields.find(_.name == "item").get.typeName == ".shop.Item")
    assert(order.fields.find(_.name == "tags").get.repeated)
  }

  test("schema derivation: nested structs, repeated arrays") {
    val reg = ProtoDescriptors.parseSet(descSet)
    val st = ProtoDescriptors.structType(reg("shop.Order"), reg)
    assert(st("id").dataType == LongType)
    assert(st("item").dataType ==
      StructType(Seq(StructField("name", StringType),
        StructField("price", DoubleType))))
    assert(st("tags").dataType == ArrayType(LongType))
    assert(st("lines").dataType.isInstanceOf[ArrayType])
    assert(st("neg").dataType == LongType)
  }

  test("decode: nested message, packed + unpacked repeated, sint, last-wins") {
    val reg = ProtoDescriptors.parseSet(descSet)
    val msg = concat(
      vint(1, 42L),
      lenDelim(2, concat(str(1, "widget"), dbl(2, 9.75))),
      packedVarints(3, Seq(3L, 5L)),
      vint(3, 7L), // unpacked occurrence appends after the packed blob
      lenDelim(4, concat(vint(1, 2L), dbl(2, 1.5))),
      lenDelim(4, concat(vint(1, 4L), dbl(2, 2.5))),
      sint(5, -42L),
      vint(6, 0L), vint(6, 1L)) // scalar last-wins
    val row = ProtoDescriptors.decodeMessage(reg("shop.Order"), reg, msg)
    assert(row.getLong(0) == 42L)
    val item = row.getStruct(1)
    assert(item.getString(0) == "widget" && item.getDouble(1) == 9.75)
    assert(row.getSeq[Long](2) == Seq(3L, 5L, 7L))
    val lines = row.getSeq[org.apache.spark.sql.Row](3)
    assert(lines.map(_.getInt(0)) == Seq(2, 4))
    assert(lines.map(_.getDouble(1)) == Seq(1.5, 2.5))
    assert(row.getLong(4) == -42L)
    assert(row.getBoolean(5))
  }

  test("decode: missing fields null out, missing repeated is empty") {
    val reg = ProtoDescriptors.parseSet(descSet)
    val row = ProtoDescriptors.decodeMessage(reg("shop.Order"), reg,
      vint(1, 7L))
    assert(row.getLong(0) == 7L)
    assert(row.isNullAt(1))
    assert(row.getSeq[Long](2).isEmpty)
    assert(row.getSeq[org.apache.spark.sql.Row](3).isEmpty)
    assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("map fields: map_entry option -> MapType, duplicate key last-wins") {
    val set = ProtoDescriptors.buildSet("m", Seq(
      "Doc" -> Seq(
        FieldDesc("id", 1, 1, TInt64, ""),
        FieldDesc("attrs", 2, LabelRepeated, TMessage, ".m.AttrsEntry"),
        FieldDesc("entries", 3, LabelRepeated, TMessage, ".m.PlainEntry")),
      "AttrsEntry" -> Seq(
        FieldDesc("key", 1, 1, TString, ""),
        FieldDesc("value", 2, 1, TInt64, "")),
      // same shape but NOT flagged map_entry: must stay array<struct>
      "PlainEntry" -> Seq(
        FieldDesc("key", 1, 1, TString, ""),
        FieldDesc("value", 2, 1, TInt64, ""))),
      mapEntries = Set("AttrsEntry"))
    val reg = ProtoDescriptors.parseSet(set)
    assert(reg("m.AttrsEntry").mapEntry && !reg("m.PlainEntry").mapEntry)
    val st = ProtoDescriptors.structType(reg("m.Doc"), reg)
    assert(st("attrs").dataType == MapType(StringType, LongType))
    assert(st("entries").dataType.isInstanceOf[ArrayType])
    def entry(field: Int, k: String, v: Long) =
      lenDelim(field, concat(str(1, k), vint(2, v)))
    val row = ProtoDescriptors.decodeMessage(reg("m.Doc"), reg, concat(
      vint(1, 9L),
      entry(2, "a", 1L), entry(2, "b", 2L), entry(2, "a", 3L),
      entry(3, "x", 5L)))
    assert(row.getMap[String, Long](1) == Map("a" -> 3L, "b" -> 2L))
    assert(row.getSeq[org.apache.spark.sql.Row](2).map(r =>
      (r.getString(0), r.getLong(1))) == Seq(("x", 5L)))
    // distributed parse round-trips the MapType through the encoder
    val df = Seq(concat(vint(1, 1L), entry(2, "k", 7L)),
      concat(vint(1, 2L), entry(2, "k", 8L), entry(2, "z", 9L)))
      .toDF("raw")
    val out = ProtoDescriptors.parse(df, "raw", set, "m.Doc")
      .selectExpr("id", "attrs['k'] AS k", "size(attrs) AS n")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 7L, 1), (2L, 8L, 2)))
  }

  test("enum fields decode to declared names; unknown numbers stay numeric") {
    val set = ProtoDescriptors.buildSet("e", Seq(
      "Ev" -> Seq(
        FieldDesc("id", 1, 1, TInt64, ""),
        FieldDesc("state", 2, 1, 14, ".e.State"),       // TEnum
        FieldDesc("bare", 3, 1, 14, ""))),              // enum w/o descriptor
      enums = Seq("State" -> Seq("IDLE" -> 0, "BUSY" -> 1)))
    val reg = ProtoDescriptors.parseSet(set)
    assert(reg("e.State").isEnum)
    val st = ProtoDescriptors.structType(reg("e.Ev"), reg)
    assert(st("state").dataType == StringType)  // resolvable enum: name
    assert(st("bare").dataType == IntegerType)  // unresolvable: number
    def dec(state: Long) = ProtoDescriptors.decodeMessage(reg("e.Ev"), reg,
      concat(vint(1, 1L), vint(2, state), vint(3, state)))
    assert(dec(1L).getString(1) == "BUSY" && dec(1L).getInt(2) == 1)
    assert(dec(0L).getString(1) == "IDLE")
    // proto3 open enum: a number with no declared value stays numeric
    assert(dec(9L).getString(1) == "9")
  }

  test("DataFrame parse: distributed decode against the descriptor set") {
    val wires = (1L to 50L).map { k =>
      concat(
        vint(1, k),
        lenDelim(2, concat(str(1, s"n$k"), dbl(2, k * 1.25))),
        packedVarints(3, Seq(k % 5, k % 7)),
        lenDelim(4, concat(vint(1, k % 3), dbl(2, k * 0.5))),
        sint(5, -k))
    }
    val df = wires.toDF("raw").repartition(4)
    val out = ProtoDescriptors.parse(df, "raw", descSet, "shop.Order")
      .orderBy("id")
    val rows = out.collect()
    assert(rows.length == 50)
    val r10 = rows(9)
    assert(r10.getLong(0) == 10L)
    assert(r10.getStruct(1).getString(0) == "n10")
    assert(r10.getSeq[Long](2) == Seq(0L, 3L))
    assert(r10.getSeq[org.apache.spark.sql.Row](3).head.getInt(0) == 1)
    assert(r10.getLong(4) == -10L)
  }

  test("unknown message name and group wire type are rejected") {
    intercept[IllegalArgumentException] {
      ProtoDescriptors.parse(Seq(Array[Byte]()).toDF("raw"), "raw",
        descSet, "shop.Nope")
    }
    val reg = ProtoDescriptors.parseSet(descSet)
    intercept[IllegalArgumentException] {
      // wire type 3 (group start) in the stream
      ProtoDescriptors.decodeMessage(reg("shop.Order"), reg,
        Array[Byte](((1 << 3) | 3).toByte))
    }
  }
}
