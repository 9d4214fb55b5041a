package graft.model

import graft.SparkSpec
import org.apache.spark.sql.types._

class TypeMappingSpec extends SparkSpec {
  import TypeMapping._

  test("internal lattice maps scalar types both ways") {
    assert(ytToSpark("int64") == LongType)
    assert(ytToSpark("uint64") == DecimalType(20, 0))
    assert(ytToSpark("utf8") == StringType)
    assert(sparkToYt(LongType) == "int64")
    assert(sparkToYt(DecimalType(20, 0)) == "uint64")
  }

  test("YT serialized spellings: string is bytes, utf8 is text") {
    assert(ytSerializedToSpark("string") == BinaryType)
    assert(ytSerializedToSpark("utf8") == StringType)
  }

  test("lossy types round-trip via originalType metadata") {
    val dt = field("d", "datetime")
    assert(dt.dataType == TimestampType)
    assert(sparkToYt(dt) == "datetime")           // not "timestamp"
    val u8 = field("u", "uint8")
    assert(sparkToYt(u8) == "uint8")              // not "int16"
    val plain = StructField("x", TimestampType)
    assert(sparkToYt(plain) == "timestamp")       // no metadata: canonical
  }

  test("primary keys are carried in metadata and survive strictify") {
    import spark.implicits._
    val target = StructType(Seq(
      field("id", "int64", primaryKey = true),
      field("v", "string")))
    val df = Seq((1L, "a")).toDF("id", "v")
    val out = strictify(df, target)
    assert(primaryKeys(out.schema) == Seq("id"))
    // metadata applied even when the type already matches
    assert(isPrimaryKey(out.schema("id")))
  }

  test("strictify casts mismatched columns and leaves unknown columns alone") {
    import spark.implicits._
    val df = Seq((1, "2.5", true)).toDF("a", "b", "extra")
    val target = StructType(Seq(
      field("a", "int64"), field("b", "double")))
    val out = strictify(df, target)
    assert(out.schema("a").dataType == LongType)
    assert(out.schema("b").dataType == DoubleType)
    assert(out.schema("extra").dataType == BooleanType)
  }
}
