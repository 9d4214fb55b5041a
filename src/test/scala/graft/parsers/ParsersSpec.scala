package graft.parsers

import graft.SparkSpec
import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ParsersSpec extends SparkSpec {
  import spark.implicits._

  test("generic json parser splits good rows from quarantine") {
    val df = Seq((1L, """{"a": 1, "b": "x"}"""), (2L, "nope"), (3L, """{"a": 3}"""))
      .toDF("id", "raw")
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val good = GenericParser.json(df, "raw", schema, keep = Seq("id"))
    assert(good.columns.toSeq == Seq("id", "a", "b"))
    val rows = good.as[(Long, Integer, String)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(1L, 3L))
    val bad = GenericParser.unparsed(df, "raw", schema, keep = Seq("id"))
      .as[(Long, String)].collect().toSeq
    assert(bad == Seq((2L, "nope")))
  }

  test("tskv parser extracts typed fields") {
    val df = Seq("k=5\tname=web\tscore=1.5").toDF("raw")
    val out = GenericParser.tskv(df, "raw", Seq(
      ("k", IntegerType), ("name", StringType), ("score", DoubleType)))
    assert(out.collect().head.toSeq == Seq(5, "web", 1.5))
  }

  test("debezium emit/receive round trip preserves rows and kinds") {
    val src = Seq(
      (1L, "a", "insert", 10L), (2L, "b", "update", 11L), (3L, "c", "delete", 12L))
      .toDF("id", "v", E.Kind, E.Lsn)
      .withColumn(E.Counter, lit(0))
      .withColumn(E.TxId, lit("tx9"))
      .withColumn(E.CommitTime, lit(1700000000000000L))
    val wire = Debezium.emit(src, Seq("id", "v"))
    assert(wire.columns.toSeq == Seq("value"))
    val back = Debezium.receive(wire, "value", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val rows = back.select("id", "v", E.Kind, E.Lsn)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(rows == Seq(
      (1L, "a", "insert", 10L), (2L, "b", "update", 11L), (3L, "c", "delete", 12L)))
    // delete kept its row image via `before`
    assert(rows(2)._2 == "c")
  }

  test("debezium op codes: snapshot reads map to insert") {
    val wire = Seq("""{"before":null,"after":{"id":7},"op":"r","ts_ms":1,"source":{"lsn":5,"txId":"t"}}""")
      .toDF("value")
    val out = Debezium.receive(wire, "value",
      StructType(Seq(StructField("id", LongType))))
    assert(out.select(E.Kind).as[String].head() == "insert")
  }
}
