package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet fixtures (TESTDATA.md).
  * All engine queries take a scale-factor directory and read these tables.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver has generated events.parquet with two physical shapes over
    // time: TIMESTAMP(NANOS) (which Spark 4 rejects unless read as raw Long)
    // and TIMESTAMP(MICROS) without UTC adjustment (read as TimestampNTZ).
    // Normalize either to TimestampType (µs) so the engine sees one canonical
    // timestamp type (TypeMapping "timestamp"), branching on the schema Spark
    // actually inferred rather than assuming a fixture vintage.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType => TsType}
      df.schema("ts").dataType match {
        case LongType =>
          // integer `div`, not `/`: double division loses ulps at ns-epoch
          // magnitude (~1.7e18), shifting some timestamps by 1 µs
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // session TZ is UTC, so the NTZ→LTZ cast is value-identical
          df.withColumn("ts", col("ts").cast(TsType))
        case _ => df
      }
    } else df
  }

  /** Register every fixture table as a temp view (the engine's SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
