package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroIOSpec extends SparkSpec {

  private def tmp(name: String) = s"/tmp/graft_test/avro_$name"

  test("all scalar + nested types survive an OCF write/read cycle") {
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("b", BooleanType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("str", StringType),
      StructField("bin", BinaryType),
      StructField("day", DateType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("dec", DecimalType(12, 2)),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, StringType)),
      StructField("nested", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val rows = Seq(
      Row(1L, 7, true, 1.5f, 2.25, "hello", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        java.time.LocalDateTime.of(2024, 3, 1, 12, 34, 56, 789000000),
        new java.math.BigDecimal("12345.67"),
        Seq(1, 2, 3), Map("a" -> "x"), Row(9L, "n")),
      Row(2L, null, null, null, null, null, null, null, null, null,
        null, null, null, null))
    val df = s.createDataFrame(rows.asJavaOrdered, schema)
    AvroIO.write(df, tmp("alltypes"), codec = "null")
    val back = AvroIO.read(s, tmp("alltypes"))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    // hex() the binary column: Array[Byte].toString is identity-based
    val a = df.withColumn("bin", hex(col("bin"))).orderBy("id").collect().toSeq
    val b = back.withColumn("bin", hex(col("bin"))).orderBy("id").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("byte-range splits tile a single large file with no dup/drop") {
    val s = spark
    import s.implicits._
    val n = 20000
    val df = s.range(n.toLong).toDF("id")
      .withColumn("payload", concat(lit("x" * 50), col("id")))
      .coalesce(1) // one container file, many blocks
    AvroIO.write(df, tmp("splits"), codec = "null")
    // tiny split size forces many byte ranges over the one file
    val back = AvroIO.read(s, tmp("splits"), maxSplitBytes = 64 * 1024)
    assert(back.rdd.getNumPartitions > 4,
      s"expected several splits, got ${back.rdd.getNumPartitions}")
    assert(back.count() == n.toLong)
    assert(back.select(sum("id")).as[Long].head() == n.toLong * (n - 1) / 2)
  }

  test("zstd-coded roundtrip preserves a real fixture table") {
    val s = spark
    val orders = graft.Tables.load(s, sf(), "orders")
    AvroIO.write(orders, tmp("orders"))
    val back = AvroIO.read(s, tmp("orders"))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      orders.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == orders.count())
    val h1 = orders.select(sum(hash(orders.columns.map(col): _*).cast("long"))).head().getLong(0)
    val h2 = back.select(sum(hash(back.columns.map(col): _*).cast("long"))).head().getLong(0)
    assert(h1 == h2)
  }

  test("avro schema conversion is an inverse pair on engine shapes") {
    val st = StructType(Seq(
      StructField("k", LongType),
      StructField("v", ArrayType(StructType(Seq(
        StructField("s", StringType, nullable = false)))))))
    val round = AvroIO.toSparkType(AvroIO.toAvroSchema(st))
    // nullability widens to true through the union encoding of fields
    assert(round.asInstanceOf[StructType].fieldNames.toSeq == Seq("k", "v"))
  }

  private implicit class SeqOps(rs: Seq[Row]) {
    def asJavaOrdered: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row]()
      rs.foreach(l.add)
      l
    }
  }
}
