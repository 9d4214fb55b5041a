package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling table rotation: route rows into time-bucketed target tables
  * (reference: pkg/abstract/model/endpoint_rotator_config.go — rotation
  * by hour/day/month with a part count). In Spark the rotation IS the
  * write partitioning: a `__rotation` date column + partitionBy gives
  * per-period directories, and dropping expired periods is a partition
  * delete — O(1) metadata, no row rewrite.
  */
object Rotator {

  sealed trait Period { def truncUnit: String; def format: String }
  case object Hourly extends Period { val truncUnit = "hour"; val format = "yyyy-MM-dd'T'HH" }
  case object Daily extends Period { val truncUnit = "day"; val format = "yyyy-MM-dd" }
  case object Monthly extends Period { val truncUnit = "month"; val format = "yyyy-MM" }

  val RotationCol = "__rotation"

  /** Tag each row with its rotation bucket. */
  def tag(df: DataFrame, timeCol: String, period: Period): DataFrame =
    df.withColumn(RotationCol,
      date_format(date_trunc(period.truncUnit, col(timeCol)), period.format))

  /** Write with per-period partitions (the rotated layout). */
  def write(df: DataFrame, timeCol: String, period: Period, path: String,
            policy: Sinks.CleanupPolicy = Sinks.Disabled): Unit =
    Sinks.parquet(tag(df, timeCol, period), path, policy,
      partitionCols = Seq(RotationCol))

  /** Partitions (periods) currently present at a rotated target. */
  def periods(spark: org.apache.spark.sql.SparkSession,
              path: String): Seq[String] =
    // partition values round-trip through directory names, where Spark
    // may re-infer them as dates — normalize back to strings
    spark.read.parquet(path).select(col(RotationCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

  /** Drop rotated periods older than `keep` periods (reference: rotator
    * part retention). A directory delete per period — no data rewrite. */
  def expire(spark: org.apache.spark.sql.SparkSession, path: String,
             keep: Int): Seq[String] = {
    val ps = periods(spark, path)
    val expired = ps.dropRight(keep)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    expired.foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$RotationCol=$p"), true)
    }
    expired
  }
}
